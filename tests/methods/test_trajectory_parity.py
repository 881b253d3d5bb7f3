"""Training-trajectory parity vs the torch reference (VERDICT r2 #2).

Both sides (reference torch components / the rebuild) start from
converter-identical weights, consume identical views + iBOT masks, and run
their full optimizer + EMA pipelines. Losses must track within fp32
accumulation noise. See tests/methods/trajectory_harness.py for exactly
what is composed on the torch side.

Marked ``long_running`` (reference ``tests/conftest.py:54-60`` convention);
the committed artifact ``docs/trajectory_parity_r3.json`` carries a longer
run of the same harness.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.methods.trajectory_harness import REF, run_parity  # noqa: E402

pytestmark = [
    pytest.mark.skipif(
        not REF.exists(), reason="reference source tree not available"
    ),
    pytest.mark.long_running,
]


def test_loss_trajectory_matches_reference():
    """Full recipe (KoLeo on, weight 0.1) with tiered tolerances.

    KoLeo is the chaos canary of this tiny regime: random-init CLS
    embeddings are near-collapsed, so its -log(NN distance) term amplifies
    fp-accumulation noise exponentially along the trajectory (measured:
    koleo component dev ~0 at step 0, ~1.6% at step 8, ~12% by step 11,
    with the SIGN of the offset flipping across seeds — chaos, not bias).
    The smooth dino/ibot components keep tracking at ~1e-4 through all 12
    steps even though KoLeo gradients flow into the shared parameters both
    sides — which is the strongest form of parameter-trajectory evidence.
    Tolerances: tight early (implementation parity), loose late (chaos).
    """
    records = run_parity(n_steps=12, seed=0)
    devs = [r["rel_dev"] for r in records]
    losses_t = [r["torch_loss"] for r in records]
    losses_j = [r["jax_loss"] for r in records]
    assert all(np.isfinite(losses_t)) and all(np.isfinite(losses_j))
    # Step 0 is pure forward parity from identical weights: tight, and the
    # koleo component itself must match (same formula, same features).
    assert devs[0] < 2e-3, (devs[0], records[0])
    k0 = records[0]
    assert abs(k0["torch_koleo"] - k0["jax_koleo"]) < 1e-2 * max(
        abs(k0["torch_koleo"]), 1e-6
    ), k0
    # Early/mid trajectory: optimizer + EMA + centering feedback parity
    # within fp32 noise (measured max 5.8e-3 at step 8).
    assert max(devs[:9]) < 1.5e-2, list(zip(range(9), devs[:9]))
    assert float(np.mean(devs[:9])) < 5e-3, devs[:9]
    # Late trajectory: bounded despite KoLeo chaos (measured 2.5e-2).
    assert max(devs) < 8e-2, list(zip(range(len(devs)), devs))
    for i, r in enumerate(records):
        # Smooth components track tightly at every step.
        assert abs(r["torch_dino"] - r["jax_dino"]) < 0.05 * max(
            abs(r["torch_dino"]), 1e-6
        ) + 1e-3, r
        assert abs(r["torch_ibot"] - r["jax_ibot"]) < 0.05 * max(
            abs(r["torch_ibot"]), 1e-6
        ) + 1e-3, r
        # KoLeo itself: within 5% until chaos dominates (measured 1.6% at
        # step 8, then exponential divergence with seed-dependent sign).
        if i <= 8:
            assert abs(r["torch_koleo"] - r["jax_koleo"]) < 0.05 * max(
                abs(r["torch_koleo"]), 1e-6
            ) + 1e-3, r
