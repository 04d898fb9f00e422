"""Noise sources: encode/decode round-trips and parity vs the reference."""

import numpy as np
import pytest

from dfd_tpu.core import noise
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_rng_noise_source_matches_reference_stream():
    """The reference's RNGNoiseSource draws standard_normal from
    default_rng(SeedSequence(seed)) and encodes the PCG64 state as
    "state,inc" (utils/noise_sources.py:4-20).  The reference class itself
    crashes on numpy >= 2 (Generator.__getstate__ returns None), so parity is
    pinned against the stream/encoding it defines rather than the class."""
    seed = 99
    oracle = np.random.default_rng(np.random.SeedSequence(seed))
    ours = noise.RNGNoiseSource(17, random_seed=seed)
    for _ in range(5):
        st = oracle.bit_generator.state["state"]
        expect_enc = "{},{}".format(st["state"], st["inc"])
        expect_noise = oracle.standard_normal(size=17)
        enc_o, noise_o = ours.sample()
        assert enc_o == expect_enc
        np.testing.assert_array_equal(noise_o, expect_noise)


def test_rng_noise_source_decode_replays():
    ours = noise.RNGNoiseSource(32, random_seed=7)
    encs, vecs = zip(*[ours.sample() for _ in range(4)])
    # decode in arbitrary order reproduces each vector exactly
    for i in (2, 0, 3, 1):
        np.testing.assert_array_equal(ours.decode(encs[i]), vecs[i])


def test_rng_noise_shared_worker_learner_stream():
    """Worker samples and learner decodes through the same object, like the
    sequential runner sharing one noise source (run_sequential.py:89-97)."""
    src = noise.RNGNoiseSource(8, random_seed=5)
    batch = [src.sample() for _ in range(6)]
    for enc, vec in batch:
        np.testing.assert_array_equal(src.decode(enc), vec)


def test_simple_noise_source_matches_reference():
    ref = load_reference()
    theirs = ref.noise_sources.SimpleNoiseSource(9, random_seed=3)
    ours = noise.SimpleNoiseSource(9, random_seed=3)
    for _ in range(3):
        _, nt = theirs.sample()
        _, no = ours.sample()
        np.testing.assert_array_equal(nt, no)
    np.testing.assert_array_equal(ours.decode(no), no)


def test_shared_noise_table_matches_reference():
    ref = load_reference()
    theirs = ref.noise_sources.SharedNoiseTable(1000, 8, random_seed=11)
    ours = noise.SharedNoiseTable(1000, 8, random_seed=11)
    for _ in range(5):
        enc_t, noise_t = theirs.sample()
        enc_o, noise_o = ours.sample()
        assert enc_t == enc_o
        np.testing.assert_array_equal(noise_t, noise_o)
        np.testing.assert_array_equal(ours.decode(enc_t), theirs.decode(enc_t))


def test_shared_noise_table_rejects_small_size():
    with pytest.raises(ValueError):
        noise.SharedNoiseTable(8, 8)


def test_counter_noise_deterministic_and_distinct():
    src = noise.CounterNoise(64, random_seed=0)
    a1 = src.generate(0, 0)
    a2 = src.generate(0, 0)
    b = src.generate(0, 1)
    c = src.generate(1, 0)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(a1, b)
    assert not np.allclose(a1, c)
    # block generation equals member-wise generation
    block = src.generate_block(0, np.arange(4))
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(block[i]), np.asarray(src.generate(0, i)))


def test_counter_noise_encode_decode():
    src = noise.CounterNoise(16, random_seed=42)
    enc, vec = src.sample(epoch=3, member_id=7)
    assert enc == "3,7"
    np.testing.assert_array_equal(src.decode(enc), vec)


def test_counter_noise_is_standard_normal():
    src = noise.CounterNoise(200_000, random_seed=1)
    v = np.asarray(src.generate(0, 0))
    assert abs(v.mean()) < 0.01
    assert abs(v.std() - 1.0) < 0.01
