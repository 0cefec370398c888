"""Guard the driver entry points: entry() must stay trace-able and
dryrun_multichip must run on the virtual mesh."""

import importlib.util
import os

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_traces(graft):
    # entry_abstract: same traced fn as entry(), ShapeDtypeStruct args —
    # materializing the 1.3B-param entry config on CPU took ~4 minutes.
    fn, args = graft.entry_abstract()
    out_shapes = jax.eval_shape(fn, *args)
    pred, maps = out_shapes
    assert pred.shape == (1, 256, 64)
    assert maps.shape[0] == 2  # depth of the entry config
    assert maps.shape[-1] == 256


def test_dryrun_multichip_runs(graft):
    graft.dryrun_multichip(8)
