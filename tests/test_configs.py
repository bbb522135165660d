"""Every shipped config (ours, native format) and every reference config
(flat format) loads into a coherent ExperimentConfig."""
import glob
import os

import pytest

from difflinker_tpu.config import GraphType, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize('path', sorted(glob.glob(os.path.join(REPO, 'configs/*.yml'))))
def test_native_configs_load(path):
    cfg = load_config(path)
    if path.endswith('_wide.yml'):
        # the TPU-recommended wide family (BASELINE.md width studies)
        assert cfg.model.hidden_nf in (256, 384)
        assert cfg.model.n_layers == 6
    elif path.endswith('_flagship.yml'):
        # the measured flagship width (BASELINE.md round-5 H=512 runs)
        assert cfg.model.hidden_nf == 512
        assert cfg.model.n_layers == 6
    else:
        assert cfg.model.hidden_nf == 128
    assert cfg.diffusion.timesteps == 500
    # context width consistent with flags
    expected = 1 + int(cfg.train.anchors_context) + int(cfg.data.has_pocket)
    assert cfg.model.context_node_nf == expected
    if cfg.data.has_pocket:
        assert cfg.model.graph_type != GraphType.FC or 'fc' in path
        assert cfg.model.in_node_nf == 9


REFERENCE = '/root/reference/configs'


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason='reference not mounted')
@pytest.mark.parametrize('path', sorted(glob.glob(os.path.join(REFERENCE, '*.yml'))))
def test_reference_configs_load(path):
    cfg = load_config(path)
    assert cfg.model.hidden_nf == 128
    assert cfg.train.lr == 2e-4
    name = os.path.basename(path)
    if 'pockets' in name:
        assert cfg.data.has_pocket
        assert cfg.model.context_node_nf == 1 + int(cfg.train.anchors_context) + 1
    if 'zinc' in name:
        assert cfg.model.n_layers == 8
        assert cfg.model.in_node_nf == 8
