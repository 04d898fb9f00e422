"""IMPALA ResNet+LSTM policy: init and per-step forward parity vs the
reference ImpalaPolicy (driven step-by-step, T=1 per call, since the
reference's multi-step LSTM unroll zips time against batch and only ever
works in the wrapper's one-step regime)."""

import numpy as np
import pytest

from dfd_tpu.models.impala import ImpalaPolicy
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

FRAME = (3, 64, 64)
A = 15


def _ref_policy(ref, seed):
    import torch

    torch.manual_seed(seed)
    # reference signature: (observation_space.shape, n_actions) with the
    # channel count and fc width hardcoded for procgen's 64x64x3
    return ref.ImpalaPolicy((64, 64, 3), A, seed=seed)


def test_impala_flat_sizes_match():
    ref = load_reference()
    theirs = _ref_policy(ref, 123)
    ours = ImpalaPolicy(FRAME, A)
    assert ours.num_params == theirs.num_params


def test_impala_init_flat_matches_reference_exactly():
    import torch

    from dfd_tpu.parity import reference_impala_init_flat

    ref = load_reference()
    theirs = _ref_policy(ref, 123)  # seeds torch internally
    ours = ImpalaPolicy(FRAME, A)
    torch.manual_seed(123)
    flat = reference_impala_init_flat(ours)
    np.testing.assert_array_equal(flat, theirs.get_trainable_flat())


def test_impala_stepwise_forward_matches_reference():
    import torch

    ref = load_reference()
    theirs = _ref_policy(ref, 7)
    ours = ImpalaPolicy(FRAME, A)
    flat = theirs.get_trainable_flat()
    params = ours.set_flat(flat)
    _, state = ours.init(7)

    rng = np.random.RandomState(0)
    T = 4
    frames = (rng.rand(T, *FRAME) * 255).astype(np.float32)
    rewards = rng.randn(T).astype(np.float32)

    theirs.reset()
    carry = ours.initial_carry()
    with torch.no_grad():
        for t in range(T):
            obs = {
                "frame": torch.as_tensor(frames[t]).view(1, 1, *FRAME),
                "reward": torch.as_tensor(rewards[t]).view(1, 1),
                "done": torch.zeros(1, 1, dtype=torch.bool),
            }
            ref_probs = theirs.forward(obs).numpy().reshape(A)
            our_probs, carry = ours.step_probs(params, state, frames[t], rewards[t], carry)
            np.testing.assert_allclose(np.asarray(our_probs), ref_probs, atol=5e-5), t


def test_impala_seq_matches_stepwise():
    ours = ImpalaPolicy(FRAME, A)
    params, state = ours.init(3)
    rng = np.random.RandomState(1)
    T = 3
    frames = (rng.rand(T, *FRAME) * 255).astype(np.float32)
    rewards = rng.randn(T).astype(np.float32)
    seq = np.asarray(ours.apply_seq(params, state, frames, rewards))
    carry = ours.initial_carry()
    for t in range(T):
        step, carry = ours.step_probs(params, state, frames[t], rewards[t], carry)
        np.testing.assert_allclose(seq[t], np.asarray(step), atol=1e-5)


def test_impala_strategy_and_entropy_shapes():
    ours = ImpalaPolicy(FRAME, A)
    params, state = ours.init(5)
    zeta = (np.random.RandomState(2).rand(4, *FRAME) * 255).astype(np.float32)
    strat = np.asarray(ours.strategy(params, state, zeta))
    assert strat.shape == (4, A)
    np.testing.assert_allclose(strat.sum(-1), 1.0, atol=1e-5)
    ent = float(ours.entropy(params, state, zeta))
    assert 0 < ent <= np.log(A) + 1e-5


def test_impala_serialize_roundtrip():
    ours = ImpalaPolicy(FRAME, A)
    params, state = ours.init(9)
    ser = ours.serialize(params, state, xp=np)
    p2, s2 = ours.deserialize(np.asarray(ser), xp=np)
    np.testing.assert_array_equal(ours.get_flat(p2), ours.get_flat(params))
    np.testing.assert_array_equal(
        np.asarray(s2["feat1_bn"]["var"]), np.asarray(state["feat1_bn"]["var"])
    )


def test_impala_rollout_integration():
    """The recurrent policy runs under the vectorized rollout engine."""
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.base import JaxEnv
    from dfd_tpu.fd import rollout as fd_rollout

    class TinyPixelEnv(JaxEnv):
        n_actions = A
        obs_shape = FRAME
        max_episode_steps = 5

        def reset(self, key=None):
            state = jnp.asarray(0, jnp.int32)
            return state, jnp.zeros(FRAME, jnp.float32)

        def step(self, state, action):
            t = state + 1
            obs = jnp.full(FRAME, jnp.float32(t) * 10.0)
            reward = (action == 0).astype(jnp.float32)
            done = t >= 4
            return t, obs, reward, done

    model = ImpalaPolicy(FRAME, A)
    params, state = model.init(0)
    jparams = jax.tree.map(jnp.asarray, params)
    env = TinyPixelEnv()
    res = fd_rollout.episode_rollout(
        model, env, jparams, state, jax.random.key(0), 5,
        deterministic=jnp.asarray(False),
        obs_mean=jnp.zeros(FRAME), obs_std=jnp.ones(FRAME),
        normalize_obs=False, obs_stats_update_chance=0.0,
    )
    assert int(res.steps) == 4
    assert np.isfinite(float(res.reward))
    assert np.isfinite(float(res.entropy))


def test_impala_bf16_compute_close_to_f32():
    import jax.numpy as jnp

    f32 = ImpalaPolicy(FRAME, A)
    bf = ImpalaPolicy(FRAME, A, compute_dtype=jnp.bfloat16)
    params, state = f32.init(2)
    frames = (np.random.RandomState(1).rand(3, *FRAME) * 255).astype(np.float32)
    a = np.asarray(f32.apply(params, state, frames))
    b = np.asarray(bf.apply(params, state, frames))
    assert b.dtype == np.float32  # accumulation and head stay f32
    np.testing.assert_allclose(a, b, atol=0.05)


def test_impala_fused_resblock_matches_patches():
    """conv_impl='fused' (the pallas VMEM-resident residual-pair kernel,
    ops/fused_resblock.py; interpret mode on CPU) must match the production
    patches lowering to float tolerance, at reference AND production widths."""
    for channels, hidden in (((16, 32, 32), 256), ((64, 128, 128), 512)):
        base = ImpalaPolicy(FRAME, A, channels=channels, hidden=hidden)
        params, state = base.init(4)
        frames = (np.random.RandomState(2).rand(2, *FRAME) * 255).astype(np.float32)
        a = np.asarray(base.apply(params, state, frames))
        for impl in ("fused", "fused_feat"):
            fused = ImpalaPolicy(
                FRAME, A, channels=channels, hidden=hidden, conv_impl=impl
            )
            b = np.asarray(fused.apply(params, state, frames))
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5, err_msg=impl)


def test_fused_feat_pool_matches_bn_conv_maxpool():
    """The fused feature-block kernel (BN-eval -> 3x3 conv -> 3x3 s2 maxpool
    with no HBM im2col tensor; round 4) must match the unfused composition
    exactly, including the -inf padding semantics of the pool's borders."""
    import jax.numpy as jnp

    from dfd_tpu.models.impala import (
        batchnorm2d_eval, conv3x3_patches, maxpool3x3s2,
    )
    from dfd_tpu.models import layers
    from dfd_tpu.ops import fused_resblock

    rng = np.random.RandomState(5)
    ci, co, H, W = 5, 7, 16, 8  # odd channel counts, rectangular frame
    x = jnp.asarray(rng.randn(3, ci, H, W).astype(np.float32))
    conv = {
        "w": jnp.asarray(rng.randn(co, ci, 3, 3).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.randn(co).astype(np.float32)),
    }
    bn_p = {
        "w": jnp.asarray(rng.rand(ci).astype(np.float32) + 0.5),
        "b": jnp.asarray(rng.randn(ci).astype(np.float32)),
    }
    bn_s = {
        "mean": jnp.asarray(rng.randn(ci).astype(np.float32)),
        "var": jnp.asarray(rng.rand(ci).astype(np.float32) + 0.2),
    }
    want = maxpool3x3s2(conv3x3_patches(conv, batchnorm2d_eval(bn_p, bn_s, x)))
    sc, sh = fused_resblock.fold_bn_eval(bn_p, bn_s, layers.BN_EPS)
    got = fused_resblock.fused_feat_pool(
        x, fused_resblock.reorder_conv_weight(conv["w"]), conv["b"], sc, sh,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_impala_vbn_matches_torch_full_model():
    """Full-model VBN parity: one train-mode forward over a buffer must
    update EVERY BatchNorm's running stats exactly like the reference's
    compute_vbn (reference policies/policy.py:31-34 + policies/impala.py:12-16),
    including the fc/policy BNs downstream of the LSTM."""
    import torch

    ref = load_reference()
    theirs = _ref_policy(ref, 21)
    ours = ImpalaPolicy(FRAME, A)
    params = ours.set_flat(theirs.get_trainable_flat())
    _, state = ours.init(21)

    rng = np.random.RandomState(3)
    N = 6
    frames = (rng.rand(N, *FRAME) * 255).astype(np.float32)
    rewards = rng.randn(N).astype(np.float32)

    buffer = [
        {
            "frame": torch.as_tensor(frames[i]).view(1, 1, *FRAME),
            "reward": torch.as_tensor(float(rewards[i])).view(1, 1),
            "done": torch.zeros(1, 1, dtype=torch.bool),
        }
        for i in range(N)
    ]
    with torch.no_grad():
        theirs.compute_vbn(buffer)
    sd = theirs.state_dict()

    new_state = ours.vbn(params, state, frames, rewards=rewards)

    pairs = [("model.0.fc.0", "fc_bn"), ("model.0.policy.0", "policy_bn")]
    for k in range(3):
        pairs.append((f"model.0.feat_convs.{k}.0", f"feat{k}_bn"))
        for r in (1, 2):
            pairs.append((f"model.0.resnet{r}.{k}.0", f"res{r}_{k}_bn1"))
            pairs.append((f"model.0.resnet{r}.{k}.3", f"res{r}_{k}_bn2"))
    assert len(pairs) == 2 + 3 * 5
    for tkey, name in pairs:
        np.testing.assert_allclose(
            np.asarray(new_state[name]["mean"]),
            sd[f"{tkey}.running_mean"].numpy(),
            rtol=2e-4, atol=1e-5, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(new_state[name]["var"]),
            sd[f"{tkey}.running_var"].numpy(),
            rtol=2e-4, atol=1e-5, err_msg=name,
        )


def test_impala_configurable_widths():
    """Production-width torso: non-default channels/hidden build, run, and
    round-trip through the flat views."""
    wide = ImpalaPolicy(FRAME, A, channels=(8, 16, 16), hidden=32)
    assert wide.num_params != ImpalaPolicy(FRAME, A).num_params
    params, state = wide.init(0)
    frames = (np.random.RandomState(0).rand(2, *FRAME) * 255).astype(np.float32)
    probs = np.asarray(wide.apply_seq(params, state, frames, np.zeros(2, np.float32)))
    assert probs.shape == (2, A)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    flat = wide.get_flat(params)
    p2 = wide.set_flat(flat)
    np.testing.assert_array_equal(wide.get_flat(p2), flat)
