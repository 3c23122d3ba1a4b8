"""Training-trajectory parity vs the torch reference (VERDICT r1 missing #2).

Same init weights, same synthetic batches, same recipe (Adam + global-norm
clip 5.0 + PIT neg-SNR, the configs' training setup) in both frameworks for
a few epochs: per-epoch losses must track and our trained SI-SDRi must not
trail the reference's. scripts/train_parity.py runs the longer committed
version (docs/TRAINING_PARITY.json).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference not available", allow_module_level=True)


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


@pytest.mark.parametrize("model_key", ["convtasnet", "dprnn"])
def test_training_trajectory_parity(model_key):
    from train_parity import run

    r = run(model_key, epochs=3, n_batches=2, batch=3, T=4000)
    ref, ours = np.array(r["ref_epoch_losses"]), np.array(r["our_epoch_losses"])
    # identical init + identical data → trajectories track closely; the
    # tolerance leaves room for f32 accumulation divergence over steps
    np.testing.assert_allclose(ours, ref, atol=0.35)
    # both recipes actually learn (loss decreases)
    assert ours[-1] < ours[0]
    assert ref[-1] < ref[0]
    # trained quality must not trail the reference
    assert r["our_si_sdri_db"] >= r["ref_si_sdri_db"] - 0.5, r
