"""Global numeric configuration.

The reference uses `Real = double` and a fixed epsilon 1e-7 (take.h:27-30),
explicitly trading performance for not having to think about precision. TPUs
are float32-native, so we default to f32 and replace the fixed epsilon with a
distance/scale-aware ray offset policy (see `ray_epsilon`).
"""

import jax.numpy as jnp

# Default real dtype for all device arrays. Tests may use float64 on CPU by
# enabling jax_enable_x64 and passing dtype explicitly to builders.
real_dtype = jnp.float32

# Minimum parametric distance for secondary rays, as used by the reference
# (take.h:30). In f32 this alone is not enough to prevent self-intersection at
# scene scale, so intersection code additionally offsets by RAY_EPS_REL * t.
C_EPSILON = 1e-4

# Relative epsilon: secondary-ray tmin = max(C_EPSILON, RAY_EPS_REL * hit_t).
RAY_EPS_REL = 1e-3

INF = float("inf")
