"""CI gate for the config-matrix sweep (test_all_configs.sh analog).

Runs the trimmed (--quick) matrix: every pipeline x the spec'd layouts,
orders and the two bit-exactness-relevant encode modes, with the
bit-equality and decode-tolerance checks inside sweep_configs.run_sweep.
The full matrix is `python sweep_configs.py` at the repo root.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_quick_sweep():
    from sweep_configs import run_sweep
    assert run_sweep(degree=256, batch=3, quick=True)
