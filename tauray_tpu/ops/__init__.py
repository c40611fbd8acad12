"""Device kernels: RNG, intersection/BVH, BSDF, sampling, tonemapping.

Every GLSL kernel of the reference's `shader/` directory has a JAX/Pallas
counterpart here. Functions come in pairs where it matters for speed:
a pure-jnp implementation (runs on CPU for tests, is the semantic
reference) and a Pallas TPU kernel with the same signature.
"""
