import time
import numpy as np
from mlsgpu_tpu.cli import _enable_compile_cache
_enable_compile_cache()
import jax, jax.numpy as jnp

dev = jax.devices()[0]

@jax.jit
def bump(x):
    return x + jnp.uint32(1)

# per-size transfer cost, fresh array each rep (defeat the host-copy cache)
for words in [1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 22]:
    x = jax.device_put(jnp.arange(words, dtype=jnp.uint32), dev)
    jax.block_until_ready(x)
    ts = []
    for _ in range(4):
        x = bump(x); jax.block_until_ready(x)
        t0 = time.monotonic()
        np.asarray(x)
        ts.append(time.monotonic() - t0)
    mb = words * 4 / 1e6
    t = min(ts)
    print(f"d2h {mb:8.2f} MB: min {t*1e3:7.1f} ms  -> {mb/t:6.1f} MB/s  (all ms: {[round(v*1e3) for v in ts]})")

a = jax.device_put(jnp.ones((4096, 4096), jnp.float32), dev)

@jax.jit
def burn(m):
    def body(c, _):
        return c @ m / 4096.0, ()
    out, _ = jax.lax.scan(body, m, None, length=200)
    return out

r = burn(a); jax.block_until_ready(r)
t0 = time.monotonic(); r = burn(a); jax.block_until_ready(r)
t_burn = time.monotonic() - t0
print(f"burn alone: {t_burn*1e3:.1f} ms")

x = bump(jax.device_put(jnp.arange(1 << 22, dtype=jnp.uint32), dev))
jax.block_until_ready(x)
t0 = time.monotonic(); np.asarray(x); t_copy = time.monotonic() - t0
print(f"copy alone (16.8MB): {t_copy*1e3:.1f} ms")

# overlap: async copy of a FRESH array while burn runs
x = bump(x); jax.block_until_ready(x)
t0 = time.monotonic()
x.copy_to_host_async()
r = burn(a)
jax.block_until_ready(r)
t_mid = time.monotonic() - t0
np.asarray(x)
t_both = time.monotonic() - t0
print(f"async copy + burn: burn done {t_mid*1e3:.1f} ms, both done {t_both*1e3:.1f} ms "
      f"(serial {(t_burn+t_copy)*1e3:.1f} ms)")

# two concurrent async copies of fresh buffers
y = bump(jax.device_put(jnp.arange(1 << 22, dtype=jnp.uint32) * 3, dev))
x = bump(x)
jax.block_until_ready((x, y))
t0 = time.monotonic()
x.copy_to_host_async(); y.copy_to_host_async()
np.asarray(x); np.asarray(y)
t2 = time.monotonic() - t0
print(f"two async copies (2x16.8MB): {t2*1e3:.1f} ms (serial ~{2*t_copy*1e3:.1f} ms)")
