import os
import textwrap

import pytest

from refnerf_tpu.utils import ginlite


def test_parse_basic_bindings():
  cfg = ginlite.GinConfig()
  cfg.parse_string(textwrap.dedent("""
      # a comment
      Config.batch_size = 1024
      Config.data_loss_type = 'mse'  # trailing comment
      Config.near = 0.
      Config.lr_final = 2e-5
      Model.single_jitter = False
      Model.bg_intensity_range = (1., 1.)
  """))
  c = cfg.get('Config')
  assert c['batch_size'] == 1024
  assert c['data_loss_type'] == 'mse'
  assert c['near'] == 0.0
  assert c['lr_final'] == 2e-5
  m = cfg.get('Model')
  assert m['single_jitter'] is False
  assert m['bg_intensity_range'] == (1.0, 1.0)


def test_later_bindings_win():
  cfg = ginlite.GinConfig()
  cfg.parse_string("Config.batch_size = 1024")
  cfg.parse_string("Config.batch_size = 2048")
  assert cfg.get('Config')['batch_size'] == 2048


def test_macros_and_refs():
  cfg = ginlite.GinConfig()
  cfg.parse_string(textwrap.dedent("""
      LR = 1e-3
      Config.lr_init = %LR
      Model.raydist_fn = @jnp.reciprocal
  """))
  assert cfg.get('Config')['lr_init'] == 1e-3
  v = cfg.get('Model')['raydist_fn']
  assert isinstance(v, ginlite.Ref)
  assert v.name == 'jnp.reciprocal'


def test_scoped_bindings():
  cfg = ginlite.GinConfig()
  cfg.parse_string(textwrap.dedent("""
      Config.batch_size = 1024
      eval/Config.batch_size = 1
  """))
  assert cfg.get('Config')['batch_size'] == 1024
  assert cfg.get('Config', scope='eval')['batch_size'] == 1


def test_include(tmp_path):
  base = tmp_path / 'base.gin'
  base.write_text("Config.batch_size = 512\nConfig.near = 2\n")
  child = tmp_path / 'child.gin'
  child.write_text(f"include '{base}'\nConfig.near = 6\n")
  cfg = ginlite.GinConfig()
  cfg.parse_file(str(child))
  assert cfg.get('Config') == {'batch_size': 512, 'near': 6}


def test_multiline_tuple():
  cfg = ginlite.GinConfig()
  cfg.parse_string("Model.bg_intensity_range = (0.,\n    1.)")
  assert cfg.get('Model')['bg_intensity_range'] == (0.0, 1.0)


def test_string_with_hash_not_comment():
  cfg = ginlite.GinConfig()
  cfg.parse_string("Config.exp_name = 'exp#1'")
  assert cfg.get('Config')['exp_name'] == 'exp#1'


def test_malformed_raises():
  cfg = ginlite.GinConfig()
  with pytest.raises(ginlite.ParseError):
    cfg.parse_string("Config.batch_size := 5")


def test_config_str_roundtrip():
  cfg = ginlite.GinConfig()
  cfg.parse_string("Config.batch_size = 7\nModel.anneal_slope = 0.5\n")
  dump = cfg.config_str()
  cfg2 = ginlite.GinConfig()
  cfg2.parse_string(dump)
  assert cfg2.get('Config') == cfg.get('Config')
  assert cfg2.get('Model') == cfg.get('Model')


def test_shipped_configs_parse():
  root = os.path.join(os.path.dirname(__file__), '..', 'configs')
  for fname in os.listdir(root):
    cfg = ginlite.GinConfig()
    cfg.add_search_path(root)
    cfg.parse_file(os.path.join(root, fname))
    assert cfg.bindings  # parsed something


def test_shipped_config_values():
  from refnerf_tpu import configs as configs_lib
  root = os.path.join(os.path.dirname(__file__), '..', 'configs')
  config, gin = configs_lib.parse(
      [os.path.join(root, 'blender_refnerf.gin')], None)
  assert config.dataset_loader == 'blender'
  assert config.batch_size == 1024
  assert config.orientation_loss_mult == 0.1
  assert config.predicted_normal_loss_mult == 3e-4
  mk = configs_lib.model_kwargs(gin)
  assert mk['num_levels'] == 2 and mk['single_mlp'] is True
  nk = configs_lib.mlp_kwargs(gin, 'NerfMLP')
  assert nk['use_reflections'] is True
  assert nk['deg_view'] == 5


def test_unknown_config_field_is_loud():
  from refnerf_tpu import configs as configs_lib
  with pytest.raises(ValueError, match='batch_sizee'):
    configs_lib.parse(None, ['Config.batch_sizee = 32'])


def test_missing_gin_file_is_loud():
  from refnerf_tpu import configs as configs_lib
  with pytest.raises(FileNotFoundError, match='nonexistent'):
    configs_lib.parse(['/nonexistent/x.gin'], [])


def test_keyword_prefix_names_are_bindings():
  """Names beginning with 'import'/'include' are bindings/macros, not
  statements (word-boundary matching)."""
  cfg = ginlite.GinConfig()
  cfg.parse_string('important_flag = True\n'
                   'included_paths.x = 1\n'
                   'from x import y\n')
  assert cfg.macros['important_flag'] is True
  assert cfg.bindings['included_paths']['x'] == 1


def test_include_resolves_relative_to_including_file(tmp_path):
  """Shipped config chains load from any cwd: includes resolve against
  the including file's own directory first."""
  d = tmp_path / 'cfgs'
  d.mkdir()
  (d / 'base.gin').write_text('Config.batch_size = 7\n')
  (d / 'top.gin').write_text("include 'base.gin'\nConfig.far = 9.0\n")
  cfg = ginlite.GinConfig()
  cfg.parse_file(str(d / 'top.gin'))  # cwd is NOT tmp_path
  assert cfg.bindings['Config']['batch_size'] == 7
  assert cfg.bindings['Config']['far'] == 9.0


def test_ref_containers_parse_and_roundtrip():
  """Lists/tuples of @refs and %macros are valid gin; config_str's output
  re-parses to the same bindings (the experiment snapshot contract)."""
  cfg = ginlite.GinConfig()
  cfg.parse_string("Model.fns = [@a, @b/c]\n"
                   "Model.pair = (%M, 2.5)\n"
                   "M = 4\n")
  fns = cfg.bindings['Model']['fns']
  assert fns == [ginlite.Ref('a'), ginlite.Ref('b/c')]
  assert cfg.bindings['Model']['pair'] == (ginlite.Macro('M'), 2.5)
  assert cfg.get('Model')['pair'] == (4, 2.5)

  cfg2 = ginlite.GinConfig()
  cfg2.parse_string(cfg.config_str())
  assert cfg2.bindings == cfg.bindings
  assert cfg2.macros == cfg.macros
