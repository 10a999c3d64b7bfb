"""Driver entry-point contract tests (CPU mesh)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts internally on loss finiteness

    def test_entry_builds(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        # structure contract: (variables, meldec_variables, phonemes, puncts, mask, style)
        assert len(args) == 6
        assert args[2].shape == args[3].shape == args[4].shape
        # don't compile the full medium model here (slow on CPU); just check
        # the function traces
        jaxpr = jax.make_jaxpr(fn)(*args)
        assert len(jaxpr.jaxpr.outvars) == 2
