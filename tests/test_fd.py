"""FD learner, DSGD, and omega: parity vs the reference implementations."""

import numpy as np
import pytest

from dfd_tpu.fd import AdaptiveOmega, DSGD, FDLearner, FDReturn, SGD
from dfd_tpu.fd.omega import OmegaParams, omega_init, omega_step
from dfd_tpu.core.noise import RNGNoiseSource, SimpleNoiseSource
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


# -- DSGD ----------------------------------------------------------------------


class _TorchFlatModule:
    """Tiny torch module exposing the reference Policy-style flat accessors."""

    def __init__(self, flat):
        import torch
        import torch.nn as nn

        self.p = nn.Parameter(torch.as_tensor(np.asarray(flat, np.float32).copy()))

    def parameters(self):
        return [self.p]


def test_dsgd_step_matches_reference():
    import torch

    ref = load_reference()
    rng = np.random.default_rng(0)
    flat = rng.standard_normal(257).astype(np.float32)
    grad = rng.standard_normal(257).astype(np.float32)

    mod = _TorchFlatModule(flat)
    their_opt = ref.DSGD(mod.parameters(), lr=0.01)
    mod.p.backward(torch.as_tensor(grad))
    their_opt.step()
    theirs = mod.p.detach().numpy()

    ours_opt = DSGD(257, lr=0.01)
    ours = ours_opt.step(flat, grad)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


def test_dsgd_lr_scale_matches_reference():
    ref = load_reference()
    their_omega = ref.AdaptiveOmega(default_value=0.4)
    our_omega = AdaptiveOmega(default_value=0.4)

    mod = _TorchFlatModule(np.ones(10, np.float32))
    their_opt = ref.DSGD(mod.parameters(), lr=0.01)
    their_opt.adjust_lr(their_omega)
    our_opt = DSGD(10, lr=0.01)
    our_opt.adjust_lr(our_omega)
    assert our_opt.lr_scale == their_opt.lr_scale


def test_dsgd_zero_grad_raises():
    with pytest.raises(FloatingPointError):
        DSGD(4, lr=0.1).step(np.ones(4, np.float32), np.zeros(4, np.float32))


def test_jnp_dsgd_matches_host():
    import jax
    import jax.numpy as jnp

    from dfd_tpu.fd.dsgd import DSGDParams, dsgd_update

    rng = np.random.default_rng(1)
    flat = rng.standard_normal(64).astype(np.float32)
    grad = rng.standard_normal(64).astype(np.float32)
    host = DSGD(64, lr=0.02)
    host.lr_scale = 0.5
    expect = host.step(flat, grad)
    hp = DSGDParams(lr=0.02, sqrt_d=float(np.sqrt(64)), min_scale=0.23, max_scale=1.0)
    got = jax.jit(dsgd_update, static_argnums=3)(jnp.asarray(flat), jnp.asarray(grad), 0.5, hp)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-6)


# -- AdaptiveOmega -------------------------------------------------------------


def test_omega_matches_reference_trajectory():
    ref = load_reference()
    kw = dict(
        default_value=0.3,
        improvement_threshold=1.035,
        reward_history_size=5,
        min_value=0,
        max_value=1,
        steps_to_min=7,
        steps_to_max=30,
    )
    theirs = ref.AdaptiveOmega(**kw)
    ours = AdaptiveOmega(**kw)
    rng = np.random.default_rng(2)
    rewards = np.concatenate(
        [rng.normal(0, 1, 20), np.linspace(0, 5, 20), np.full(20, 5.0), rng.normal(-3, 1, 20)]
    )
    for r in rewards:
        theirs.step(float(r))
        ours.step(float(r))
        assert abs(ours.omega - theirs.omega) < 1e-12
    theirs.step(None)
    ours.step(None)
    assert ours.omega == theirs.omega


def test_jnp_omega_matches_host():
    host = AdaptiveOmega(default_value=0.5, reward_history_size=4, steps_to_min=5, steps_to_max=20)
    hp = OmegaParams(
        improvement_threshold=host.improvement_threshold,
        min_omega=0.0,
        max_omega=1.0,
        increase=host.increase,
        decrease=host.decrease,
    )
    state = omega_init(0.5, 4)
    rewards = [1.0, 2.0, 1.5, -1.0, -2.0, 3.0, 3.0, 3.1, 0.0]
    for r in rewards:
        host.step(r)
        state = omega_step(state, r, hp)
        assert abs(float(state.omega) - host.omega) < 1e-6


# -- FDLearner -----------------------------------------------------------------


def _make_reference_learner(ref, flat, noise_std, max_delayed, lr=0.01):
    policy = ref.DiscretePolicy(2, 9, seed=123)
    policy.set_trainable_flat(np.asarray(flat, np.float32))
    opt = ref.DSGD(policy.parameters(), lr=lr)
    omega = ref.AdaptiveOmega(default_value=0.2)
    noise = load_reference().noise_sources.SimpleNoiseSource(policy.num_params, random_seed=3)
    learner = ref.FiniteDifferences(
        policy, opt, omega, noise, noise_std=noise_std, batch_size=10, max_delayed_return=max_delayed
    )
    return learner, policy


def _batch(rng, noise_src, epoch, n, d):
    """Identical return batches for both learners via a shared noise stream."""
    rets_theirs, rets_ours = [], []
    ref = load_reference()
    for i in range(n):
        enc, eps = noise_src.sample()
        r = float(rng.normal())
        their_ret = ref.FDReturn()
        their_ret.epoch = epoch
        their_ret.encoded_noise = eps  # SimpleNoiseSource: encoding IS the vector
        their_ret.reward = r
        our_ret = FDReturn(epoch=epoch, encoded_noise=eps, reward=r)
        rets_theirs.append(their_ret)
        rets_ours.append(our_ret)
    return rets_theirs, rets_ours


def test_fd_step_matches_reference():
    ref = load_reference()
    rng = np.random.default_rng(3)
    d_policy = ref.DiscretePolicy(2, 9, seed=123)
    d = d_policy.num_params
    flat0 = d_policy.get_trainable_flat()

    theirs, their_policy = _make_reference_learner(ref, flat0, noise_std=0.02, max_delayed=10)
    our_noise = SimpleNoiseSource(d, random_seed=3)
    ours = FDLearner(
        flat0,
        DSGD(d, lr=0.01),
        AdaptiveOmega(default_value=0.2),
        our_noise,
        noise_std=0.02,
        batch_size=10,
        max_delayed_return=10,
    )

    shared_noise = SimpleNoiseSource(d, random_seed=42)
    for epoch in range(5):
        rt, ro = _batch(rng, shared_noise, epoch, 10, d)
        upd_t = theirs.step(rt, 0.1, 0.0, 0.0)
        upd_o = ours.step(ro, 0.1, 0.0, 0.0)
        np.testing.assert_allclose(
            ours.flat, their_policy.get_trainable_flat(), rtol=1e-5, atol=1e-6
        )
        assert abs(upd_t - upd_o) < 1e-5
        assert ours.epoch == theirs.epoch


def test_fd_delayed_and_discarded_returns_match_reference():
    ref = load_reference()
    rng = np.random.default_rng(4)
    d_policy = ref.DiscretePolicy(2, 9, seed=123)
    d = d_policy.num_params
    flat0 = d_policy.get_trainable_flat()

    theirs, their_policy = _make_reference_learner(ref, flat0, noise_std=0.02, max_delayed=3)
    ours = FDLearner(
        flat0,
        DSGD(d, lr=0.01),
        AdaptiveOmega(default_value=0.2),
        SimpleNoiseSource(d, random_seed=3),
        noise_std=0.02,
        batch_size=10,
        max_delayed_return=3,
    )
    shared_noise = SimpleNoiseSource(d, random_seed=43)

    # advance both learners a few epochs
    for epoch in range(4):
        rt, ro = _batch(rng, shared_noise, epoch, 8, d)
        theirs.step(rt, 0.0, 0.0, 0.0)
        ours.step(ro, 0.0, 0.0, 0.0)

    # now feed a mix of current, delayed-but-acceptable, and too-old epochs
    batches = []
    for epoch in (4, 3, 2, 0):  # 0 is older than max_delayed_return=3 -> discard
        batches.append(_batch(rng, shared_noise, epoch, 2, d))
    rt = [r for bt, _ in batches for r in bt]
    ro = [r for _, bo in batches for r in bo]
    theirs.step(rt, 0.0, 0.0, 0.0)
    ours.step(ro, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(ours.flat, their_policy.get_trainable_flat(), rtol=1e-5, atol=1e-6)
    assert ours.discarded_returns == theirs.discarded_returns > 0


def test_fd_empty_batch_returns_zero():
    d = 16
    ours = FDLearner(
        np.ones(d, np.float32),
        DSGD(d, lr=0.01),
        AdaptiveOmega(),
        SimpleNoiseSource(d),
        max_delayed_return=2,
    )
    assert ours.step([], None, None, None) == 0.0
    stale = FDReturn(epoch=99, encoded_noise=np.zeros(d), reward=1.0)
    assert ours.step([stale], 0.0, 0.0, 0.0) == 0.0
    assert ours.discarded_returns == 1


def test_fd_with_rng_noise_source_roundtrip():
    """End-to-end with the PCG64 replay source: worker samples, learner decodes."""
    d = 32
    src = RNGNoiseSource(d, random_seed=9)
    ours = FDLearner(
        np.zeros(d, np.float32), SGD(d, lr=0.1), AdaptiveOmega(), src, noise_std=0.5,
        max_delayed_return=5,
    )
    rets = []
    for i in range(6):
        enc, eps = src.sample()
        rets.append(FDReturn(epoch=0, encoded_noise=enc, reward=float(i)))
    upd = ours.step(rets, 0.0, 0.0, 0.0)
    assert upd > 0
