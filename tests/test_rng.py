import numpy as np

from tauray_tpu.ops import rng


def _pcg_ref(seed: int) -> int:
    """Independent scalar reimplementation of pcg
    (www.pcg-random.org single-round output fn, as in the reference)."""
    M = 0xFFFFFFFF
    seed = (seed * 747796405 + 2891336453) & M
    seed = (((seed >> ((seed >> 28) + 4)) ^ seed) * 277803737) & M
    seed = (seed >> 22) ^ seed
    return seed


def _pcg4d_ref(v):
    """Scalar model of the reference's swizzle form: `seed += seed.yzxy *
    seed.wxyz` evaluates the swizzles on the OLD vector (simultaneous),
    unlike the sequential jcgt pseudo-code (reference:
    shader/math.glsl pcg4d)."""
    M = 0xFFFFFFFF

    def mix(v):
        old = list(v)
        return [(old[0] + old[1] * old[3]) & M,
                (old[1] + old[2] * old[0]) & M,
                (old[2] + old[0] * old[1]) & M,
                (old[3] + old[1] * old[2]) & M]

    v = [(x * 1664525 + 1013904223) & M for x in v]
    v = mix(v)
    v = [(x >> 16) ^ x for x in v]
    v = mix(v)
    return v


def test_pcg_scalar_matches():
    seeds = np.array([0, 1, 42, 123456789, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.pcg(seeds))
    want = [_pcg_ref(int(s)) for s in seeds]
    assert list(got) == want


def test_pcg4d_matches_swizzle_semantics():
    v = np.array([[1, 2, 3, 4], [0, 0, 0, 0], [7, 1929, 55, 0xDEADBEEF]],
                 dtype=np.uint32)
    got = np.asarray(rng.pcg4d(v))
    for i in range(len(v)):
        assert list(got[i]) == _pcg4d_ref([int(x) for x in v[i]])


def test_init_random_sampler_chain():
    coord = np.array([[10, 20, 0, 0]], dtype=np.uint32)
    s = np.asarray(rng.init_random_sampler(coord))[0]
    assert s[0] == 10
    assert s[1] == (20 ^ _pcg_ref(10)) & 0xFFFFFFFF
    assert s[2] == (0 ^ _pcg_ref(int(s[1]))) & 0xFFFFFFFF


def test_uniform_floats_in_range():
    coord = np.arange(64, dtype=np.uint32).reshape(16, 4)
    seed = rng.init_random_sampler(coord)
    seed, u = rng.generate_uniform_random(seed)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1.0).all()
    _, u2 = rng.generate_uniform_random(seed)
    assert not np.allclose(u, np.asarray(u2))
