"""Pocket-conditioned generation from fragments + a pre-cut pocket PDB.

Port of generate_with_pocket.py (same as generate_with_protein but the user
supplies the already-extracted pocket, read_pocket at :85-114).

    python -m difflinker_tpu.cli.generate_with_pocket \
        --fragments frags.sdf --pocket pocket.pdb --run RUN_DIR ...
"""
from __future__ import annotations

import sys

from difflinker_tpu.cli import common
from difflinker_tpu.cli.generate_with_protein import build_argparser, run


def main(argv=None):
    args = build_argparser(pocket_is_precut=True).parse_args(argv)
    common.enable_compilation_cache()
    return run(args, pocket_is_precut=True)


if __name__ == '__main__':
    sys.exit(main())
