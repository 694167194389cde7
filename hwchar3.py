import time, jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench as B
from tinyfusers_tpu.pipeline import sd
cfg = sd.SD15
dtype = jnp.bfloat16
params = B.fast_random_params(cfg, dtype)
ids = jnp.full((1,77), 49407, jnp.int32).at[:,0].set(49406)
g = jnp.float32(7.5)
# warmup (compile + weight upload)
lat = sd.initial_latent(jax.random.key(0), 1, cfg, dtype)
img = sd.generate(params, ids, ids, lat, g, num_steps=20, cfg=cfg); np.asarray(img)
img = sd.generate(params, ids, ids, lat, g, num_steps=20, cfg=cfg); np.asarray(img)
print("warm", flush=True)
# timed with DIFFERENT latent each run
for i in range(4):
    lat = sd.initial_latent(jax.random.key(100+i), 1, cfg, dtype)
    np.asarray(lat)  # materialize input first
    t0 = time.perf_counter()
    img = sd.generate(params, ids, ids, lat, g, num_steps=20, cfg=cfg)
    s = int(np.asarray(img).astype(np.int64).sum())
    print(f"varied run{i}: {time.perf_counter()-t0:.3f}s sum={s}", flush=True)
# and same latent repeated
lat = sd.initial_latent(jax.random.key(100), 1, cfg, dtype); np.asarray(lat)
for i in range(3):
    t0 = time.perf_counter()
    img = sd.generate(params, ids, ids, lat, g, num_steps=20, cfg=cfg)
    s = int(np.asarray(img).astype(np.int64).sum())
    print(f"same run{i}: {time.perf_counter()-t0:.3f}s sum={s}", flush=True)
