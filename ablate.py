"""Op-level ablation on TPU: time scanned stacks of individual UNet ops to
find where the 32ms UNet forward goes."""
import time, jax, functools
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tinyfusers_tpu import ops

dtype = jnp.bfloat16
N = 50  # scan length; per-op time = total / N

def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    r = f(*args); np.asarray(r).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/N*1e3:.3f} ms/op  (total {dt*1e3:.1f} ms)", flush=True)

def scanstack(op):
    def run(x, w):
        def body(c, _):
            return op(c, w), None
        y, _ = jax.lax.scan(body, x, None, length=N)
        return y
    return run

# level-0 tensors: (2, 64, 64, 320)
x0 = jnp.ones((2, 64, 64, 320), dtype)
w33 = jnp.ones((3, 3, 320, 320), dtype) * 0.01
timed("conv3x3 320->320 @64x64", scanstack(lambda x, w: ops.conv2d(x, w, padding=1)), x0, w33)
gnw = jnp.ones((320,), dtype)
timed("group_norm 320 @64x64", scanstack(lambda x, w: ops.group_norm(x, 32, w, w)), x0, gnw)
timed("silu @64x64x320", scanstack(lambda x, w: ops.silu(x)), x0, gnw)

x1 = jnp.ones((2, 32, 32, 640), dtype)
w33b = jnp.ones((3, 3, 640, 640), dtype) * 0.01
timed("conv3x3 640->640 @32x32", scanstack(lambda x, w: ops.conv2d(x, w, padding=1)), x1, w33b)

x2 = jnp.ones((2, 16, 16, 1280), dtype)
w33c = jnp.ones((3, 3, 1280, 1280), dtype) * 0.01
timed("conv3x3 1280->1280 @16x16", scanstack(lambda x, w: ops.conv2d(x, w, padding=1)), x2, w33c)

# attention at level 0: q (16, 4096, 40)
q = jnp.ones((16, 4096, 40), dtype)
timed("flash attn s=4096 d=40", scanstack(lambda x, w: ops.sdpa(x, x, x, impl="flash")), q, gnw)
timed("xla  attn s=4096 d=40", scanstack(lambda x, w: ops.sdpa(x, x, x, impl="xla")), q, gnw)

# linear at token level: (2, 4096, 320)
xt = jnp.ones((2, 4096, 320), dtype)
wl = jnp.ones((320, 1280), dtype) * 0.01
wl2 = jnp.ones((1280, 320), dtype) * 0.01
timed("linear 320->1280->320 @4096tok", scanstack(
    lambda x, w: ops.linear(ops.linear(x, wl), wl2)), xt, gnw)
