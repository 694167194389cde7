import time, jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tinyfusers_tpu import ops

def timed(name, fn, *args, per=1, reps=3):
    f = jax.jit(fn)
    r = f(*args); np.asarray(r).ravel()[:1]
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args); np.asarray(r).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/per*1e3:.3f} ms/op (total {best*1e3:.1f} ms)", flush=True)
    return best/per

N = 16
# unrolled matmul chain (keep values sane with *0 + identity-ish)
a = jnp.eye(4096, dtype=jnp.bfloat16)
def mmchain(x):
    for _ in range(N):
        x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
    return x
t = timed(f"matmul 4096^3 bf16 x{N} unrolled", mmchain, a, per=N)
print(f"  -> {2*4096**3/t/1e12:.1f} TFLOP/s", flush=True)

# unrolled elementwise on 64MB
big = jnp.ones((32*1024*1024,), jnp.bfloat16)
def echain(x):
    for _ in range(N):
        x = x * 1.0001
    return x
t = timed(f"elementwise 64MB x{N} unrolled", echain, big, per=N)
print(f"  -> {2*big.nbytes/t/1e9:.1f} GB/s", flush=True)

# conv chain at UNet level-0 shape
x0 = jnp.ones((2, 64, 64, 320), jnp.bfloat16)
w33 = jnp.full((3, 3, 320, 320), 1e-4, jnp.bfloat16)
def cchain(x):
    for _ in range(N):
        x = ops.conv2d(x, w33, padding=1)
    return x
t = timed(f"conv3x3 320 @64x64 x{N} unrolled", cchain, x0, per=N)
flops = 2*2*64*64*320*320*9
print(f"  -> {flops/t/1e12:.1f} TFLOP/s", flush=True)

# group_norm chain
gw = jnp.ones((320,), jnp.bfloat16)
def gchain(x):
    for _ in range(N):
        x = ops.group_norm(x, 32, gw, gw)
    return x
timed(f"group_norm @64x64x320 x{N} unrolled", gchain, x0, per=N)

# flash attn unrolled
q = jnp.full((16, 4096, 40), 0.1, jnp.bfloat16)
def fchain(x):
    for _ in range(4):
        x = ops.sdpa(x, x, x, impl="flash")
    return x
timed("flash attn s=4096 d=40 x4 unrolled", fchain, q, per=4)
def xchain(x):
    for _ in range(4):
        x = ops.sdpa(x, x, x, impl="xla")
    return x
timed("xla attn s=4096 d=40 x4 unrolled", xchain, q, per=4)
