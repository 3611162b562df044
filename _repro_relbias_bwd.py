import os
os.environ["JAX_TRACEBACK_FILTERING"] = "off"
import numpy as np
import jax, jax.numpy as jnp
from generative_recommenders_tpu.ops.pallas.hstu_attention_relbias import (
    hstu_mha_dense_pallas_relbias,
)

B, N, H, D, V, Nm = 2, 512, 2, 32, 32, 512
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3, jnp.float32)
k = jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3, jnp.float32)
v = jnp.asarray(rng.standard_normal((B, N, H, V)) * 0.3, jnp.float32)
lengths = jnp.asarray([N, 300], jnp.int32)
ts = jnp.asarray(1_600_000_000 + np.cumsum(rng.integers(1, 90000, (B, N)), axis=1))
pos_w = jnp.asarray((rng.standard_normal(2 * Nm - 1) * 0.05).astype(np.float32))
ts_w = jnp.asarray((rng.standard_normal(129) * 0.05).astype(np.float32))

def loss(q_, k_, v_, pw_, tw_):
    out = hstu_mha_dense_pallas_relbias(
        q_, k_, v_, lengths, ts, pw_, tw_, interpret=False
    )
    return jnp.sum(out.astype(jnp.float32) ** 2)

g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(q, k, v, pos_w, ts_w)
print("OK", [np.asarray(x).shape for x in g])
