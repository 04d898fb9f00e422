"""Atari CNN policy: init and forward parity vs the reference AtariPolicy."""

import numpy as np
import pytest

from dfd_tpu.models.atari import AtariCNN
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

HW = (84, 84)  # the reference hardcodes the 84x84 conv output size (2592)


def _ref_policy(ref, seed):
    return ref.AtariPolicy(HW, 6, seed=seed)


def test_atari_flat_sizes_match():
    ref = load_reference()
    theirs = _ref_policy(ref, 123)
    ours = AtariCNN(HW, 6)
    assert ours.num_params == theirs.num_params


def test_atari_init_flat_matches_reference_exactly():
    import torch

    from dfd_tpu.parity import reference_init_flat

    ref = load_reference()
    torch.manual_seed(0)
    theirs = _ref_policy(ref, 123)
    ours = AtariCNN(HW, 6)
    torch.manual_seed(0)
    flat = reference_init_flat(ours, 123)
    np.testing.assert_array_equal(flat, theirs.get_trainable_flat())


def test_atari_native_init_close():
    ref = load_reference()
    theirs = _ref_policy(ref, 123)
    ours = AtariCNN(HW, 6)
    params, _ = ours.init(123)
    np.testing.assert_allclose(ours.get_flat(params), theirs.get_trainable_flat(), atol=1e-6)


def test_atari_forward_matches_reference():
    import torch

    ref = load_reference()
    theirs = _ref_policy(ref, 7)
    ours = AtariCNN(HW, 6)
    params, state = ours.init(7)
    xs = np.random.RandomState(0).rand(2, 4, HW[0], HW[1]).astype(np.float32)
    with torch.no_grad():
        ref_probs = theirs.model(torch.as_tensor(xs)).numpy()
    our_probs = np.asarray(ours.apply(params, state, xs))
    np.testing.assert_allclose(our_probs, ref_probs, atol=5e-5)


def test_atari_channels_last_input():
    ours = AtariCNN(HW, 6)
    params, state = ours.init(3)
    rng = np.random.RandomState(1)
    nchw = rng.rand(2, 4, HW[0], HW[1]).astype(np.float32)
    nhwc = nchw.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours.apply(params, state, nhwc)),
        np.asarray(ours.apply(params, state, nchw)),
        atol=1e-6,
    )


def test_atari_serialize_roundtrip():
    ours = AtariCNN(HW, 6)
    params, state = ours.init(11)
    ser = ours.serialize(params, state, xp=np)
    p2, s2 = ours.deserialize(np.asarray(ser), xp=np)
    np.testing.assert_array_equal(ours.get_flat(p2), ours.get_flat(params))
    np.testing.assert_array_equal(np.asarray(s2["bn2"]["var"]), np.asarray(state["bn2"]["var"]))


def test_atari_vbn_matches_torch():
    import torch

    ref = load_reference()
    theirs = _ref_policy(ref, 13)
    ours = AtariCNN(HW, 6)
    params, state = ours.init(13)
    buf = np.random.RandomState(2).rand(4, 4, HW[0], HW[1]).astype(np.float32)
    with torch.no_grad():
        theirs.model.train()
        theirs.model(torch.as_tensor(buf))
        theirs.model.eval()
    new_state = ours.vbn(params, state, buf)
    sd = theirs.state_dict()
    for tkey, name in [("model.1", "bn1"), ("model.4", "bn2"), ("model.8", "bn3")]:
        np.testing.assert_allclose(
            np.asarray(new_state[name]["mean"]), sd[f"{tkey}.running_mean"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_state[name]["var"]), sd[f"{tkey}.running_var"].numpy(), atol=1e-4
        )


def test_compute_dtype_bf16_close_to_f32():
    """AtariCNN(compute_dtype=bf16) keeps f32 accumulation: action probs
    stay close to the f32 lowering (same lever as ImpalaPolicy's)."""
    import jax.numpy as jnp

    f32 = AtariCNN((64, 64), 9, in_channels=3)
    bf16 = AtariCNN((64, 64), 9, in_channels=3, compute_dtype=jnp.bfloat16)
    params, state = f32.init(0)
    x = np.random.RandomState(1).rand(4, 3, 64, 64).astype(np.float32)
    pa = np.asarray(f32.apply(params, state, x))
    pb = np.asarray(bf16.apply(params, state, x))
    assert pa.shape == pb.shape == (4, 9)
    np.testing.assert_allclose(pa, pb, atol=0.03)
    # probs remain a distribution
    np.testing.assert_allclose(pb.sum(axis=1), 1.0, atol=1e-5)
