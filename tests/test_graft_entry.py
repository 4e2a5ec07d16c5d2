"""The driver's contract: entry() compile-checks and dryrun_multichip runs.

dryrun_multichip is exercised in-process by test_parallel (parallel.dryrun);
here we pin the entry() surface so driver breakage shows up in CI first.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()
