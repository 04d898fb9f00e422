"""Novelty archive/handler: behavioral parity vs the reference strategy stack.

Archive *logic* parity is tested with a shared deterministic float64
evaluator injected into both sides (so accept/reject/evict decisions must
match exactly, independent of fp32 forward-backend noise); end-to-end model
integration is covered separately with loose tolerances.
"""

import numpy as np
import pytest

from dfd_tpu.models import DiscreteMLP
from dfd_tpu.novelty import StrategyHandler
from dfd_tpu.ops import distances
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

N_IN, N_ACT, D = 3, 4, 12  # flat = W[(N_ACT, N_IN)] for the shared evaluator


def _shared_strategy(flat, zeta):
    """Deterministic float64 strategy: softmax(zeta @ W.T)."""
    w = np.asarray(flat, np.float64).reshape(N_ACT, N_IN)
    logits = np.asarray(zeta, np.float64) @ w.T
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class _SharedEvalPolicy:
    """Minimal reference-compatible policy whose strategy uses the shared
    evaluator, so both archives see identical float64 strategies."""

    def __init__(self, flat):
        self.flat = np.asarray(flat, np.float64).copy()

    def get_trainable_flat(self):
        return self.flat.copy()

    def set_trainable_flat(self, flat):
        self.flat = np.asarray(flat, np.float64).copy()

    def get_strategy(self, zeta):
        return _shared_strategy(self.flat, zeta)


def _setup(max_hist):
    ref = load_reference()
    shared = _SharedEvalPolicy(np.zeros(D))
    their_handler = ref.StrategyHandler(
        shared, ref.math_helpers.categorical_tvd, max_history_size=max_hist
    )
    model = DiscreteMLP(N_IN, N_ACT)  # only used for interface defaults
    our_handler = StrategyHandler(
        model,
        {},
        distances.categorical_tvd,
        max_history_size=max_hist,
        evaluator=_shared_strategy,
    )
    return ref, shared, their_handler, our_handler


def _flats(rng, n, scale=1.0):
    return [scale * rng.standard_normal(D) for _ in range(n)]


def test_archive_fill_evaluate_and_replace_parity():
    ref, shared, theirs, ours = _setup(max_hist=4)
    rng = np.random.default_rng(0)
    zeta = rng.random((6, N_IN))

    for f in _flats(rng, 4):
        theirs.add_policy(_SharedEvalPolicy(f))
        ours.add_policy(f)

    theirs.set_zeta(zeta)
    ours.set_zeta(zeta)
    np.testing.assert_array_equal(ours.strategy_tensor, theirs.strategy_tensor)

    their_mgr = theirs.strategy_history_manager
    our_arc = ours.archive
    assert set(our_arc.known_dists) == set(their_mgr.known_dists)
    for k in our_arc.known_dists:
        assert our_arc.known_dists[k] == their_mgr.known_dists[k]
    assert our_arc.worst_point_idx == their_mgr.worst_point_idx

    # submit candidates against the full archive; accept/reject must agree,
    # including the replaced index and the refreshed bookkeeping
    for i in range(10):
        cand = (0.1 + 0.4 * i) * rng.standard_normal(D)
        their_result = their_mgr.submit_policy(_SharedEvalPolicy(cand))
        our_result = our_arc.submit(cand)
        assert their_result == our_result, f"candidate {i}"
        assert our_arc.worst_point_idx == their_mgr.worst_point_idx
        for k in our_arc.known_dists:
            assert our_arc.known_dists[k] == their_mgr.known_dists[k]


def test_novelty_query_parity():
    ref, shared, theirs, ours = _setup(max_hist=8)
    rng = np.random.default_rng(1)
    zeta = rng.random((5, N_IN))

    for f in _flats(rng, 5):
        theirs.add_policy(_SharedEvalPolicy(f))
        ours.add_policy(f)
    theirs.set_zeta(zeta)
    ours.set_zeta(zeta)

    for f in _flats(rng, 3, scale=0.3):
        their_nov = theirs.compute_novelty(_SharedEvalPolicy(f))
        our_nov = ours.compute_novelty(f)
        assert their_nov == our_nov


def test_novelty_guards_return_zero():
    _, _, _, ours = _setup(max_hist=4)
    flat = np.zeros(D)
    assert ours.compute_novelty(flat) == 0.0  # no zeta yet
    ours.add_policy(flat)
    ours.set_zeta(np.random.default_rng(2).random((4, N_IN)))
    assert ours.compute_novelty(flat) == 0.0  # archive smaller than 2


def test_model_backed_handler_end_to_end():
    """Integration with the real DiscreteMLP evaluator (fp tolerances only)."""
    model = DiscreteMLP(N_IN, N_ACT)
    params, state = model.init(0)
    base = model.get_flat(params)
    handler = StrategyHandler(model, state, distances.categorical_tvd, max_history_size=4)
    rng = np.random.default_rng(3)
    zeta = rng.random((5, N_IN)).astype(np.float32)
    for _ in range(4):
        handler.add_policy(base + 0.3 * rng.standard_normal(base.size).astype(np.float32))
    handler.set_zeta(zeta)
    assert handler.strategy_tensor.shape == (4, 5, N_ACT)
    nov = handler.compute_novelty(base)
    assert nov > 0


def test_batch_novelty_matches_host_loop():
    import jax.numpy as jnp

    model = DiscreteMLP(N_IN, N_ACT)
    params, state = model.init(0)
    base = model.get_flat(params)
    handler = StrategyHandler(model, state, distances.categorical_tvd, max_history_size=6)
    rng = np.random.default_rng(4)
    zeta = rng.random((5, N_IN)).astype(np.float32)
    for _ in range(4):
        handler.add_policy(base + 0.3 * rng.standard_normal(base.size).astype(np.float32))
    handler.set_zeta(zeta)

    flats = np.stack([base + 0.2 * rng.standard_normal(base.size).astype(np.float32) for _ in range(7)])
    batch = np.asarray(handler.compute_novelty_batch(jnp.asarray(flats), jnp.asarray(zeta)))
    host = np.asarray([handler.compute_novelty(f) for f in flats])
    np.testing.assert_allclose(batch, host, atol=1e-5)
