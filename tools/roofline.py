"""Roofline accounting for the flagship train step (VERDICT r4 #3).

Combines (a) the XLA cost analysis of the jitted train step (FLOPs + HBM
bytes — platform-independent dot/conv counts, so this part can run on the
CPU backend without touching the chip) with (b) a measured ms/step from
bench.py / tools/profile_step.py, and prints utilization vs the TPU v5e
single-chip peaks. This is the evidence that either the 45K rays/s
self-target is reachable (utilization well under the rooflines) or the
step is device-bound and the target should be retired.

Usage:
  JAX_PLATFORMS=cpu python tools/roofline.py [measured_ms_per_step]
Env: BENCH_BATCH (default 4096), BENCH_MODE (bf16|f32, default bf16),
RESULT (optional path: also dump the accounting as one JSON artifact,
e.g. ROOFLINE_r05.json).

v5e peaks (public TPU v5e spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
The flagship step is mixed-precision (bf16 trunks, f32 heads/epilogues/
optimizer), so "MFU vs bf16 peak" is a lower bound on how hot the MXU
actually runs for the f32 fraction.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_SIZE = int(os.environ.get('BENCH_BATCH', 4096))
MODE = os.environ.get('BENCH_MODE', 'bf16')

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main():
  measured_ms = float(sys.argv[1]) if len(sys.argv) > 1 else None

  import jax
  import jax.numpy as jnp
  import numpy as np
  os.makedirs('.jax_cache', exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', '.jax_cache')

  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import rays as rays_lib
  from refnerf_tpu.models import construct
  from refnerf_tpu.train import step as step_lib

  config, gin = configs_lib.parse(
      [os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), 'configs', 'blender_refnerf.gin')],
      [f'Config.batch_size = {BATCH_SIZE}',
       'Config.randomized = False',
       'Config.sample_noise_size = 0'] +
      (["NerfMLP.compute_dtype = 'bfloat16'"] if MODE == 'bf16' else []))

  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  state = step_lib.create_train_state(config, model, params)

  rng = np.random.RandomState(0)
  d = rng.randn(BATCH_SIZE, 3).astype(np.float32)
  v = d / np.linalg.norm(d, axis=-1, keepdims=True)
  rays = rays_lib.dummy_rays(BATCH_SIZE).replace(
      origins=jnp.asarray(rng.randn(BATCH_SIZE, 3).astype(np.float32) * 0.1),
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(v),
      radii=jnp.full((BATCH_SIZE, 1), 0.001),
      lossmult=jnp.ones((BATCH_SIZE, 1)),
      near=jnp.full((BATCH_SIZE, 1), float(config.near)),
      far=jnp.full((BATCH_SIZE, 1), float(config.far)))
  batch = rays_lib.Batch(
      rays=rays, rgb=jnp.zeros((BATCH_SIZE, 3), jnp.float32))

  train_step = step_lib.make_train_step(model, config)

  lowered = jax.jit(train_step, donate_argnums=(0,)).lower(state, batch)
  try:
    cost = lowered.compile().cost_analysis()
  except Exception as e:  # remote-compile services may not expose analysis
    print(f'compile-side cost_analysis unavailable ({e!r}); '
          'falling back to lowered.cost_analysis()')
    cost = lowered.cost_analysis()
  if isinstance(cost, (list, tuple)):
    cost = cost[0]

  flops = float(cost.get('flops', 0.0))
  bytes_accessed = float(cost.get('bytes accessed', 0.0))
  print(f'batch={BATCH_SIZE} mode={MODE}')
  print(f'XLA cost analysis: {flops / 1e12:.2f} TFLOP/step, '
        f'{bytes_accessed / 1e9:.1f} GB accessed/step')
  if jax.default_backend() == 'cpu':
    # The CPU backend barely fuses, so 'bytes accessed' counts nearly every
    # intermediate at full width - a gross upper bound on real TPU HBM
    # traffic (the TPU-compiled step fuses elementwise chains into the dots).
    # The FLOP count is layout-independent and trustworthy either way.
    print('NOTE: bytes from the CPU backend are pre-fusion (upper bound); '
          'the HBM roofline line below is only meaningful from a '
          'TPU-compiled analysis.')

  # Speed-of-light times vs the two single-chip ceilings.
  t_mxu_ms = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
  t_hbm_ms = bytes_accessed / (V5E_HBM_GBPS * 1e9) * 1e3
  print(f'speed-of-light: compute {t_mxu_ms:.1f} ms/step '
        f'(vs {V5E_BF16_TFLOPS:.0f} TFLOP/s bf16), '
        f'memory {t_hbm_ms:.1f} ms/step (vs {V5E_HBM_GBPS:.0f} GB/s HBM)')
  bound = 'compute (MXU)' if t_mxu_ms > t_hbm_ms else 'memory (HBM)'
  print(f'binding roofline at this arithmetic intensity: {bound}, '
        f'floor {max(t_mxu_ms, t_hbm_ms):.1f} ms/step '
        f'= {BATCH_SIZE / max(t_mxu_ms, t_hbm_ms) * 1e3:,.0f} rays/s')

  if measured_ms is not None:
    mfu = t_mxu_ms / measured_ms
    hbm_util = t_hbm_ms / measured_ms
    print(f'measured {measured_ms:.1f} ms/step '
          f'({BATCH_SIZE / measured_ms * 1e3:,.0f} rays/s): '
          f'MFU {mfu * 100:.1f}% of bf16 peak, '
          f'HBM {hbm_util * 100:.1f}% of peak bandwidth')
    print(f'headroom to the binding roofline: '
          f'{(measured_ms / max(t_mxu_ms, t_hbm_ms) - 1) * 100:.0f}% '
          f'above the floor')

  result = os.environ.get('RESULT')
  if result:
    import json
    out = {
        'backend': jax.default_backend(),
        'batch': BATCH_SIZE,
        'mode': MODE,
        'xla_tflop_per_step': flops / 1e12,
        'xla_gb_accessed_per_step': bytes_accessed / 1e9,
        'bytes_are_prefusion_upper_bound': jax.default_backend() == 'cpu',
        'v5e_peaks': {'bf16_tflops': V5E_BF16_TFLOPS,
                      'hbm_gbps': V5E_HBM_GBPS},
        'speed_of_light_ms': {'compute_mxu': t_mxu_ms, 'memory_hbm': t_hbm_ms},
        'binding_roofline': bound,
        'roofline_floor_rays_per_sec': BATCH_SIZE / max(t_mxu_ms, t_hbm_ms)
                                       * 1e3,
    }
    if measured_ms is not None:
      out['measured_ms_per_step'] = measured_ms
      out['measured_rays_per_sec'] = BATCH_SIZE / measured_ms * 1e3
      out['mfu_vs_bf16_peak'] = mfu
      out['hbm_util_vs_peak'] = hbm_util
      out['headroom_above_floor'] = measured_ms / max(t_mxu_ms, t_hbm_ms) - 1
    with open(result, 'w') as f:
      json.dump(out, f, indent=1)
    print(f'wrote {result}')


if __name__ == '__main__':
  main()
