"""Policy models: init-draw and forward parity vs the reference torch policies.

Bit-exact claims: the opt-in parity init (`dfd_tpu.parity.reference_init_flat`)
reproduces the reference's initial trainable flat exactly, including the
1-ulp residue from its overwrite of torch's default init.  Forward passes are
compared under float32 tolerances (jnp and torch differ in accumulation
order, ~1e-5).
"""

import numpy as np
import pytest

from dfd_tpu.models import DiscreteMLP, GaussianMLP
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_discrete_init_flat_matches_reference_exactly():
    import torch

    from dfd_tpu.parity import reference_init_flat

    ref = load_reference()
    torch.manual_seed(0)
    theirs = ref.DiscretePolicy(2, 9, seed=123)
    ours = DiscreteMLP(2, 9)
    torch.manual_seed(0)
    flat = reference_init_flat(ours, 123)
    assert ours.num_params == theirs.num_params
    np.testing.assert_array_equal(flat, theirs.get_trainable_flat())


def test_discrete_native_init_close_to_reference():
    """The native normc init matches the reference up to its overwrite residue."""
    ref = load_reference()
    theirs = ref.DiscretePolicy(2, 9, seed=123)
    ours = DiscreteMLP(2, 9)
    params, _ = ours.init(123)
    np.testing.assert_allclose(ours.get_flat(params), theirs.get_trainable_flat(), atol=1e-6)


def test_gaussian_init_flat_matches_reference_exactly():
    import torch

    from dfd_tpu.parity import reference_init_flat

    ref = load_reference()
    torch.manual_seed(0)
    theirs = ref.MujocoPolicy(17, 6, seed=123)
    ours = GaussianMLP(17, 6)
    torch.manual_seed(0)
    flat = reference_init_flat(ours, 123)
    assert ours.num_params == theirs.num_params
    np.testing.assert_array_equal(flat, theirs.get_trainable_flat())


def test_discrete_forward_matches_reference():
    import torch

    ref = load_reference()
    theirs = ref.DiscretePolicy(4, 3, seed=7)
    ours = DiscreteMLP(4, 3)
    params, state = ours.init(7)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((11, 4)).astype(np.float32)
    with torch.no_grad():
        ref_probs = theirs.forward(xs).numpy()
    our_probs = np.asarray(ours.apply(params, state, xs))
    np.testing.assert_allclose(our_probs, ref_probs, atol=5e-5)


def test_discrete_flat_roundtrip_through_reference():
    """Setting the reference's flat into our model reproduces its forward."""
    import torch

    ref = load_reference()
    theirs = ref.DiscretePolicy(4, 3, seed=11)
    ours = DiscreteMLP(4, 3)
    flat = theirs.get_trainable_flat() + 0.05 * np.random.RandomState(1).randn(theirs.num_params).astype(np.float32)
    theirs.set_trainable_flat(flat)
    params = ours.set_flat(flat)
    _, state = ours.init(11)
    xs = np.random.RandomState(2).randn(5, 4).astype(np.float32)
    with torch.no_grad():
        ref_probs = theirs.forward(xs).numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(params, state, xs)), ref_probs, atol=5e-5)


def test_discrete_entropy_and_strategy_match_reference():
    import torch

    ref = load_reference()
    theirs = ref.DiscretePolicy(4, 3, seed=5)
    ours = DiscreteMLP(4, 3)
    params, state = ours.init(5)
    xs = np.random.RandomState(3).randn(9, 4).astype(np.float32)
    with torch.no_grad():
        ref_ent = theirs.get_entropy(xs)
        ref_strat = theirs.get_strategy(torch.as_tensor(xs))
    assert abs(float(ours.entropy(params, state, xs)) - ref_ent) < 2e-4
    np.testing.assert_allclose(np.asarray(ours.strategy(params, state, xs)), ref_strat, atol=5e-5)


def test_discrete_deterministic_action_matches_reference():
    ref = load_reference()
    theirs = ref.DiscretePolicy(2, 9, seed=123)
    ours = DiscreteMLP(2, 9)
    params, state = ours.init(123)
    import jax

    key = jax.random.key(0)
    for i in range(10):
        obs = np.random.RandomState(i).rand(2)
        ref_a = theirs.get_action(obs, deterministic=True)
        our_a = int(ours.act(params, state, obs, key, deterministic=True))
        assert ref_a == our_a


def test_discrete_serialize_matches_reference_statedict():
    import torch

    from dfd_tpu.parity import reference_init_flat

    ref = load_reference()
    torch.manual_seed(3)
    theirs = ref.DiscretePolicy(3, 4, seed=9)
    ours = DiscreteMLP(3, 4)
    torch.manual_seed(3)
    flat = reference_init_flat(ours, 9)
    params = ours.set_flat(flat)
    _, state = ours.init(9)
    ref_ser = np.asarray(theirs.serialize(), dtype=np.float32)
    our_ser = np.asarray(ours.serialize(params, state, xp=np), dtype=np.float32)
    np.testing.assert_array_equal(our_ser, ref_ser)
    # deserialize round-trip restores both views
    p2, s2 = ours.deserialize(our_ser, xp=np)
    np.testing.assert_array_equal(ours.get_flat(p2), ours.get_flat(params))
    np.testing.assert_array_equal(np.asarray(s2["bn1"]["var"]), np.asarray(state["bn1"]["var"]))


def test_gaussian_forward_matches_reference():
    import torch

    ref = load_reference()
    theirs = ref.MujocoPolicy(8, 3, seed=21)
    ours = GaussianMLP(8, 3)
    params, state = ours.init(21)
    xs = np.random.RandomState(4).randn(7, 8).astype(np.float32)
    with torch.no_grad():
        ref_mean, ref_std = theirs.forward(xs)
    mean, std = ours.apply(params, state, xs)
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(std), ref_std.numpy(), atol=5e-5)
    with torch.no_grad():
        ref_ent = theirs.get_entropy(xs)
        ref_strat = theirs.get_strategy(torch.as_tensor(xs))
    assert abs(float(ours.entropy(params, state, xs)) - ref_ent) < 2e-4
    np.testing.assert_allclose(np.asarray(ours.strategy(params, state, xs)), ref_strat, atol=5e-5)


def test_vbn_matches_torch_train_pass():
    import torch

    ref = load_reference()
    theirs = ref.DiscretePolicy(4, 3, seed=13)
    ours = DiscreteMLP(4, 3)
    params, state = ours.init(13)
    buf = np.random.RandomState(5).randn(32, 4).astype(np.float32)
    with torch.no_grad():
        theirs.compute_vbn(buf)
    new_state = ours.vbn(params, state, buf)
    ref_sd = theirs.state_dict()
    for k, bn in [("model.0", "bn1"), ("model.3", "bn2"), ("model.6", "bn3")]:
        np.testing.assert_allclose(
            np.asarray(new_state[bn]["mean"]), ref_sd[f"{k}.running_mean"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_state[bn]["var"]), ref_sd[f"{k}.running_var"].numpy(), atol=1e-4
        )
        assert float(new_state[bn]["n"]) == float(ref_sd[f"{k}.num_batches_tracked"])


def test_population_vmap_forward():
    """A stacked population of perturbed params evaluates under one vmap."""
    import jax
    import jax.numpy as jnp

    ours = DiscreteMLP(2, 9)
    params, state = ours.init(0)
    flat = ours.get_flat(params)
    P = 8
    noise = np.random.RandomState(0).randn(P, flat.size).astype(np.float32) * 0.02
    flats = flat[None, :] + noise
    pop_params = jax.vmap(lambda v: ours.set_flat(v, xp=jnp))(jnp.asarray(flats))
    obs = jnp.asarray(np.random.RandomState(1).rand(P, 2), jnp.float32)
    probs = jax.vmap(lambda p, o: ours.apply(p, state, o)[0])(pop_params, obs)
    assert probs.shape == (P, 9)
    single = np.asarray(ours.apply(ours.set_flat(flats[3]), state, obs[3])[0])
    np.testing.assert_allclose(np.asarray(probs[3]), single, atol=1e-6)


def test_torch_sampler_matches_reference_categorical_stream():
    """TorchSampler consumes the global torch RNG exactly like the reference's
    Categorical sampling, given the same seeding + construction replay."""
    import torch

    from dfd_tpu.parity import TorchSampler

    ref = load_reference()
    seed = 123
    torch.manual_seed(seed)
    theirs = ref.DiscretePolicy(2, 9, seed=seed)
    ours = DiscreteMLP(2, 9)
    sampler = TorchSampler(seed)
    sampler.replay_construction(ours.reference_linear_dims())
    # after construction both streams are aligned; sample through both paths
    rng = np.random.RandomState(0)
    state_torch = torch.get_rng_state()
    obs_seq = [rng.rand(2) for _ in range(20)]
    ref_actions = [theirs.get_action(o, deterministic=False) for o in obs_seq]
    torch.set_rng_state(state_torch)
    params, state = ours.init(seed)
    our_actions = [
        sampler.sample_categorical(np.asarray(ours.apply(params, state, o)[0])) for o in obs_seq
    ]
    assert ref_actions == our_actions
