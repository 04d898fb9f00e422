from dfd_tpu.core.flat import FlatSpec, flatten, unflatten, update_from_flat
from dfd_tpu.core.noise import (
    CounterNoise,
    RNGNoiseSource,
    SharedNoiseTable,
    SimpleNoiseSource,
)
from dfd_tpu.core.welford import (
    Welford,
    WelfordState,
    jnp_init,
    jnp_mean_std,
    jnp_merge,
    jnp_merge_population,
    jnp_update_batch,
)

__all__ = [
    "FlatSpec",
    "flatten",
    "unflatten",
    "update_from_flat",
    "CounterNoise",
    "RNGNoiseSource",
    "SimpleNoiseSource",
    "SharedNoiseTable",
    "Welford",
    "WelfordState",
    "jnp_init",
    "jnp_update_batch",
    "jnp_merge",
    "jnp_merge_population",
    "jnp_mean_std",
]
