"""Multi-chip dryrun on the 8-device virtual CPU mesh."""

import jax
import numpy as np


def test_make_mesh_shapes():
    from qwen3_tts_tpu.parallel import sharding as S

    mesh = S.make_mesh(jax.devices()[:8])
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
