"""Graft entry points: multichip dryrun must compile + run on the virtual
8-device CPU mesh (the driver runs this separately; this guards regressions)."""

import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    # dryrun_multichip is self-hosting: it builds its mesh from
    # jax.devices('cpu') (conftest's XLA_FLAGS guarantee 8 virtual CPU
    # devices) and re-execs a subprocess if this process somehow
    # initialized jax with fewer. It must never skip.
    import __graft_entry__ as g
    g.dryrun_multichip(8)      # asserts finite loss internally


@pytest.mark.slow
def test_entry_builds():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = fn(*args)
    assert out.vertices.shape == (32, 6890, 3)
