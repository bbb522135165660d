"""Batch xyz→sdf conversion over a samples directory.

Port of run_obabel.py: walks per-uuid sample dirs and converts every sampled
`.xyz` to `.sdf` — via the OpenBabel binary when installed (the published
protocol), else native geometric bond perception.

    python -m difflinker_tpu.cli.run_obabel --samples samples/ [--force]
"""
from __future__ import annotations

import argparse
import os
import sys

from difflinker_tpu.cli import common
from difflinker_tpu.io.xyz import obabel_available, xyz_to_sdf


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--samples', required=True)
    p.add_argument('--force', action='store_true', help='reconvert existing')
    args = p.parse_args(argv)

    mode = 'obabel' if obabel_available() else 'native'
    common.log(f'conversion backend: {mode}')
    n = 0
    for root, _, files in os.walk(args.samples):
        for fname in files:
            stem = fname.split('_')[0]
            if not (fname.endswith('.xyz') and stem.isdigit()):
                continue
            out_dir = os.path.join(root, 'obabel')
            os.makedirs(out_dir, exist_ok=True)
            sdf = os.path.join(out_dir, f'{stem}_.sdf')
            if os.path.exists(sdf) and not args.force:
                continue
            xyz_to_sdf(os.path.join(root, fname), sdf)
            n += 1
    common.log(f'converted {n} files')
    return 0


if __name__ == '__main__':
    sys.exit(main())
