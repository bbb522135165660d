"""difflinker_tpu/demo.py — the meta -> recipe mapping behind the bundled
pre-trained artifacts (examples/params/) and the analysis scripts."""
import json

import jax
import numpy as np
import pytest

from difflinker_tpu.config import CenterOfMass, DatasetFamily, GraphType
from difflinker_tpu.demo import (load_demo_model, recipe_config,
                                 recipe_val_dataset)

ZINC = {'hidden': 32, 'layers': 1, 'timesteps': 6}
POCKET = {'hidden': 32, 'layers': 1, 'timesteps': 6, 'pocket': True,
          'com': 'anchors'}
MULTIFRAG = {'hidden': 32, 'layers': 1, 'timesteps': 6,
             'n_fragments': [3, 5], 'given_anchors': True}
VLB = {'hidden': 32, 'layers': 1, 'timesteps': 6,
       'noise_schedule': 'learned', 'loss_type': 'vlb'}
INPAINT = {'hidden': 32, 'layers': 1, 'timesteps': 6, 'inpainting': True}


def test_recipe_config_families():
    z = recipe_config(ZINC)
    assert (z.model.in_node_nf, z.model.context_node_nf) == (8, 2)
    assert z.model.graph_type == GraphType.FC
    assert z.train.center_of_mass == CenterOfMass.FRAGMENTS

    p = recipe_config(POCKET)
    assert p.model.context_node_nf == 3
    assert p.model.graph_type == GraphType.A4
    assert p.train.center_of_mass == CenterOfMass.ANCHORS
    assert p.data.family == DatasetFamily.MOAD

    m = recipe_config(MULTIFRAG)
    assert (m.model.in_node_nf, m.model.context_node_nf) == (9, 2)
    assert m.train.anchors_context
    assert m.train.center_of_mass == CenterOfMass.ANCHORS
    assert m.data.family == DatasetFamily.GEOM
    m2 = recipe_config({**MULTIFRAG, 'given_anchors': False})
    assert m2.model.context_node_nf == 1
    assert m2.train.center_of_mass == CenterOfMass.FRAGMENTS

    v = recipe_config(VLB)
    assert v.diffusion.noise_schedule == 'learned'
    assert v.diffusion.loss_type == 'vlb'

    i = recipe_config(INPAINT)
    assert i.diffusion.inpainting and i.model.centering
    assert not recipe_config(ZINC).model.centering

    assert recipe_config(ZINC, timesteps=3).diffusion.timesteps == 3


def test_recipe_val_dataset_matches_recipe():
    zd = recipe_val_dataset(ZINC, 4)
    assert zd.samples[0]['one_hot'].shape[-1] == 8
    pd = recipe_val_dataset(POCKET, 4)
    assert pd.samples[0]['pocket_mask'].sum() > 0
    md = recipe_val_dataset(MULTIFRAG, 6)
    ks = {int(s['name'].split('_')[0].replace('synthmf', ''))
          for s in md.samples}
    assert ks <= {3, 4, 5} and len(ks) > 1
    assert md.samples[0]['one_hot'].shape[-1] == 9


def test_load_demo_model_roundtrip(tmp_path):
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io.checkpoints import save_params_npz

    cfg = recipe_config(MULTIFRAG)
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(0))
    path = str(tmp_path / 'm.npz')
    save_params_npz(params, path, dtype=np.float16)  # bundled-artifact mode
    with open(path + '.config.json', 'w') as f:
        json.dump(MULTIFRAG, f)

    cfg2, params2, meta = load_demo_model(path)
    assert meta == MULTIFRAG
    assert cfg2.model.hidden_nf == 32
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == a.dtype  # cast back from fp16 to template dtype
        np.testing.assert_allclose(a, b, atol=1e-3)

    # wrong-recipe template must fail loudly (shape validation)
    with open(path + '.config.json', 'w') as f:
        json.dump({**MULTIFRAG, 'hidden': 64}, f)
    with pytest.raises(ValueError, match='different model config'):
        load_demo_model(path)

def test_bundled_artifacts_load():
    """Every shipped examples/params/*.npz must load through
    load_demo_model: the fp16 payload has to shape-validate against the
    recipe rebuilt from its sidecar .config.json. Catches a corrupt or
    mis-paired bundled artifact before a user (or bench.py's artifact-gated
    lines) hits it."""
    import glob
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'examples', 'params')
    paths = sorted(glob.glob(os.path.join(root, '*.npz')))
    assert paths, 'no bundled artifacts found'
    for path in paths:
        assert os.path.exists(path + '.config.json'), path
        cfg, params, meta = load_demo_model(path)
        assert cfg.model.hidden_nf == meta['hidden'], path
        n_leaves = len(jax.tree.leaves(params))
        assert n_leaves > 10, (path, n_leaves)
