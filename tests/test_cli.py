"""CLI smoke tests: train.py / eval.py / render.py run end to end as real
subprocesses (flag parsing, gin loading, config snapshot, checkpointing)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import _make_blender_scene

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))

_TINY_GIN = """
Config.dataset_loader = 'blender'
Config.batching = 'all_images'
Config.near = 2.
Config.far = 6.
Config.batch_size = 32
Config.render_chunk_size = 256
Config.max_steps = 4
Config.checkpoint_every = 4
Config.print_every = 2
Config.val_sample_num = 1
Config.randomized = False
Config.sample_noise_size = 0
Config.data_loss_type = 'mse'
Config.interlevel_loss_mult = 0.0
Config.orientation_loss_mult = 0.0
Config.orientation_coarse_loss_mult = 0.0
Config.predicted_normal_loss_mult = 0.0
Config.predicted_normal_coarse_loss_mult = 0.0
Config.eval_dataset_limit = 1
Model.num_levels = 2
Model.single_mlp = True
Model.num_prop_samples = 4
Model.num_nerf_samples = 4
Model.anneal_slope = 0.
Model.dilation_bias = 0.
Model.dilation_multiplier = 0.
Model.single_jitter = False
Model.resample_padding = 0.01
NerfMLP.net_depth = 1
NerfMLP.net_width = 8
NerfMLP.net_depth_viewdirs = 1
NerfMLP.net_width_viewdirs = 8
NerfMLP.bottleneck_width = 4
NerfMLP.max_deg_point = 2
NerfMLP.deg_view = 1
NerfMLP.basis_shape = 'octahedron'
NerfMLP.basis_subdivisions = 1
NerfMLP.disable_density_normals = True
NerfMLP.enable_pred_normals = False
NerfMLP.use_directional_enc = False
NerfMLP.use_reflections = False
NerfMLP.enable_pred_roughness = False
NerfMLP.use_diffuse_color = False
NerfMLP.use_specular_tint = False
NerfMLP.use_n_dot_v = False
"""


def _run(script, gin_file, extra_bindings=(), extra_args=()):
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  # The host image's sitecustomize registers the remote-TPU PJRT plugin
  # whenever this var is set and then force-selects it, overriding
  # JAX_PLATFORMS - so a CLI test would silently run on (and serialize
  # behind) the real chip. Unset it: the subprocess stays CPU-only.
  env.pop('PALLAS_AXON_POOL_IPS', None)
  env['PYTHONPATH'] = _REPO + os.pathsep + env.get('PYTHONPATH', '')
  # Share the persistent compile cache across CLI subprocesses.
  env['JAX_COMPILATION_CACHE_DIR'] = os.path.join(_REPO, '.jax_cache')
  env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '0'
  cmd = [sys.executable, os.path.join(_REPO, script),
         f'--gin_configs={gin_file}']
  for b in extra_bindings:
    cmd.append(f'--gin_bindings={b}')
  cmd.extend(extra_args)
  # Generous timeout: CLI subprocesses compile fresh XLA programs and this
  # host has one CPU core that tests may share with device-side benchmarks.
  return subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=900, cwd=_REPO)


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
  root = tmp_path_factory.mktemp('cli')
  scene = str(root / 'scene')
  _make_blender_scene(scene, n_frames=2, res=8, split='train')
  _make_blender_scene(scene, n_frames=1, res=8, split='test')
  gin_file = str(root / 'tiny.gin')
  with open(gin_file, 'w') as f:
    f.write(_TINY_GIN)
    f.write(f"Config.data_dir = '{scene}'\n")
    f.write(f"Config.checkpoint_dir = '{root / 'exp'}'\n")
    f.write("Config.exp_name = 'cli_test'\n")
  return root, gin_file


def _ensure_trained(workdir):
  """Idempotently train so eval/render tests are order-independent."""
  root, gin_file = workdir
  ckpt_dir = root / 'exp' / 'ckpt' / 'cli' / 'cli_test' / 'last'
  if not (ckpt_dir.exists() and any(ckpt_dir.iterdir())):
    result = _run('train.py', gin_file)
    assert result.returncode == 0, result.stderr[-2000:]


def test_train_cli(workdir):
  root, gin_file = workdir
  result = _run('train.py', gin_file)
  assert result.returncode == 0, result.stderr[-2000:]
  # Config snapshot written like the reference (configs.py:186-193).
  snap = root / 'exp' / 'logs' / 'cli' / 'cli_test' / 'config.gin'
  assert snap.exists()
  # A checkpoint was produced (always-latest retention under last/).
  ckpt_dir = root / 'exp' / 'ckpt' / 'cli' / 'cli_test' / 'last'
  assert any(p.name == '4' for p in ckpt_dir.iterdir()), list(
      ckpt_dir.iterdir())


def test_eval_cli_after_train(workdir):
  root, gin_file = workdir
  _ensure_trained(workdir)
  result = _run('eval.py', gin_file)
  assert result.returncode == 0, result.stderr[-2000:]
  out_dir = root / 'exp' / 'ckpt' / 'cli' / 'cli_test' / 'test_preds'
  assert (out_dir / 'avg_metrics.txt').exists()


def test_render_cli_after_train(workdir):
  root, gin_file = workdir
  _ensure_trained(workdir)
  result = _run('render.py', gin_file)
  assert result.returncode == 0, result.stderr[-2000:]
  out_dirs = list(
      (root / 'exp' / 'ckpt' / 'cli' / 'cli_test').glob('test_preds_step_*'))
  assert out_dirs, 'no render output dir'
  assert any(p.suffix == '.png' for p in out_dirs[0].iterdir())


def test_export_serving_cli(workdir):
  root, gin_file = workdir
  _ensure_trained(workdir)
  out = str(root / 'scene.rnsrv')
  result = _run('tools/export_serving.py', gin_file,
                extra_args=[f'--out={out}', '--chunk=32',
                            '--platforms=cpu'])
  assert result.returncode == 0, result.stderr[-2000:]
  from refnerf_tpu import serving
  served = serving.load_serving(out)
  assert served.chunk == 32 and 'rgb' in served.meta['buffers']


def test_torch_checkpoint_cli_roundtrip(workdir):
  """export_torch_checkpoint -> import_torch_checkpoint restores the same
  params under a new experiment (pure CLI path, no reference needed -
  the export IS the reference layout)."""
  torch = pytest.importorskip('torch')
  root, gin_file = workdir
  _ensure_trained(workdir)
  ckpt = str(root / 'roundtrip.ckpt')
  result = _run('tools/export_torch_checkpoint.py', gin_file,
                extra_args=[f'--out={ckpt}'])
  assert result.returncode == 0, result.stderr[-2000:]
  blob = torch.load(ckpt, map_location='cpu', weights_only=True)
  assert blob['global_step'] == 4
  assert any(k.startswith('model.nerf_mlp.') for k in blob['state_dict'])

  result = _run('tools/import_torch_checkpoint.py', gin_file,
                extra_bindings=["Config.exp_name = 'reimported'"],
                extra_args=[f'--ckpt={ckpt}'])
  assert result.returncode == 0, result.stderr[-2000:]

  import jax
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.models import construct
  from refnerf_tpu.train import checkpoints as ckpt_lib
  from refnerf_tpu.train import step as step_lib

  def load(exp_name):
    config, gin = configs_lib.parse(
        [gin_file], [f"Config.exp_name = '{exp_name}'"])
    model = construct.construct_model(config, gin)
    params = construct.init_params(jax.random.PRNGKey(config.seed), model)
    state = step_lib.create_train_state(config, model, params)
    mgr = ckpt_lib.CheckpointManager(ckpt_lib.checkpoint_dir(config))
    state = mgr.restore(jax.device_get(state))
    mgr.close()
    return state

  orig, back = load('cli_test'), load('reimported')
  assert int(back.step) == 4
  for (path, a), b in zip(
      jax.tree_util.tree_leaves_with_path(orig.params),
      jax.tree.leaves(back.params)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=jax.tree_util.keystr(path))


def test_extract_mesh_cli(workdir):
  """extract_mesh.py produces a parseable non-empty PLY from a trained
  checkpoint. --iso=-1 auto-picks the grid midpoint, which always crosses
  unless the density field is constant - so success is assertable even on
  a barely-trained model."""
  root, gin_file = workdir
  _ensure_trained(workdir)
  out = str(root / 'mesh.ply')
  result = _run('tools/extract_mesh.py', gin_file,
                extra_args=['--resolution=17', '--iso=-1', '--bound=1.0',
                            f'--out={out}'])
  assert result.returncode == 0, result.stderr[-2000:]
  from refnerf_tpu import geometry
  mesh = geometry.read_ply(out)
  assert mesh['verts'].shape[1] == 3 and mesh['faces'].shape[1] == 3
  assert len(mesh['faces']) > 0

  # Half-specified explicit bounds fail loudly instead of being ignored.
  result = _run('tools/extract_mesh.py', gin_file,
                extra_args=['--resolution=9', '--lower=-1,-1,-1',
                            f'--out={out}'])
  assert result.returncode != 0
  assert 'must be given together' in result.stderr
