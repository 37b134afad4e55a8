import time, numpy as np
import jax, jax.numpy as jnp

x = jnp.asarray(np.random.randn(2048, 2048).astype(np.float32))
@jax.jit
def f(x):
    def body(i, a):
        return a @ x * 1e-3
    return jax.lax.fori_loop(0, 50, body, x)
np.asarray(f(x))
t0 = time.perf_counter()
np.asarray(f(x))
dt = time.perf_counter() - t0
# 50 matmuls of 2048^3 * 2 flops
print(f"{dt*1e3:.1f} ms, {50*2*2048**3/dt/1e12:.1f} TFLOP/s")
