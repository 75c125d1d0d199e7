"""Graft entry points: multichip dryrun must compile + run on the virtual
8-device CPU mesh (the driver runs this separately; this guards regressions)."""

import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import jax
    if len(jax.devices()) < 8:
        # the axon sitecustomize can eagerly initialize backends before
        # conftest's XLA_FLAGS apply when the TPU relay is mid-restart;
        # the driver validates dryrun_multichip in a clean env regardless
        pytest.skip("virtual device count not applied in this process")
    import __graft_entry__ as g
    g.dryrun_multichip(8)      # asserts finite loss internally


@pytest.mark.slow
def test_entry_builds():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = fn(*args)
    assert out.vertices.shape == (32, 6890, 3)
