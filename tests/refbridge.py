"""Import bridge for the mounted torch reference at /root/reference.

The reference implementation (minfenli/refnerf-pl) is used as a *numerical
oracle* for full-pipeline parity tests: same weights + same rays must give
matching renderings, losses, and optimizer steps. Its import graph pulls in
packages this image does not ship (gin, dm_pix, lpips, cv2, pycolmap); none
of them participate in the numerics under test, so we install minimal
stand-in modules before importing `internal.*`.

The reference tree is untrusted public content: we execute only its library
code paths (model/losses/step functions) under our own inputs.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = '/root/reference'


def _identity_configurable(fn=None, *args, **kwargs):
  """Supports @gin.configurable, @gin.configurable() and named usage."""
  if fn is not None and callable(fn):
    return fn
  return lambda f: f


def _install_fake(name, **attrs):
  if name in sys.modules:
    return sys.modules[name]
  mod = types.ModuleType(name)
  for k, v in attrs.items():
    setattr(mod, k, v)
  sys.modules[name] = mod
  return mod


def _install_fakes():
  # The reference targets an older numpy that still aliased the stdlib math
  # module as np.math (ref_utils.py uses np.math.factorial).
  import math
  import numpy as np
  if not hasattr(np, 'math'):
    np.math = math

  try:
    import gin  # noqa: F401  (real gin present: nothing to fake)
  except ImportError:
    gin = _install_fake(
        'gin',
        configurable=_identity_configurable,
        add_config_file_search_path=lambda *a, **k: None,
        parse_config_files_and_bindings=lambda *a, **k: None,
        config_str=lambda: '',
        external_configurable=_identity_configurable,
    )
    gin.torch = _install_fake('gin.torch')

  try:
    import dm_pix  # noqa: F401
  except ImportError:
    _install_fake('dm_pix', ssim=lambda *a, **k: None)

  try:
    import lpips  # noqa: F401
  except ImportError:
    _install_fake('lpips', LPIPS=type('LPIPS', (), {}))

  try:
    import cv2  # noqa: F401
  except ImportError:
    _install_fake('cv2', decomposeProjectionMatrix=None)

  try:
    import pycolmap  # noqa: F401
  except ImportError:
    _install_fake('pycolmap', SceneManager=type('SceneManager', (), {}))


def load_reference():
  """Import and return the reference's internal modules.

  Returns a namespace with .models, .train_utils, .utils, .configs,
  .stepfun, .render, .coord, .ref_utils, .sample_utils.
  """
  _install_fakes()
  if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

  import internal.configs as ref_configs
  import internal.coord as ref_coord
  import internal.models as ref_models
  import internal.ref_utils as ref_ref_utils
  import internal.render as ref_render
  import internal.sample_utils as ref_sample_utils
  import internal.stepfun as ref_stepfun
  import internal.train_utils as ref_train_utils
  import internal.utils as ref_utils

  ns = types.SimpleNamespace(
      configs=ref_configs,
      coord=ref_coord,
      models=ref_models,
      ref_utils=ref_ref_utils,
      render=ref_render,
      sample_utils=ref_sample_utils,
      stepfun=ref_stepfun,
      train_utils=ref_train_utils,
      utils=ref_utils,
  )
  return ns
