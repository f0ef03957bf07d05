"""A minimal gin-config-compatible parser.

The reference drives everything through gin files + `--gin_bindings` flags
(ref: internal/configs.py:174-194). gin itself is not a dependency of this
framework, so this module implements the subset of the gin language those
configs (and typical user overrides) actually use:

  - `Target.param = <python literal>` bindings (numbers, strings, bools,
    tuples, lists, dicts, None, scientific notation),
  - `@name` / `@scope/name` configurable references (kept as Ref objects),
  - `%MACRO` references and `MACRO = value` macro definitions,
  - `include 'other.gin'`,
  - comments and blank lines,
  - multi-line values inside brackets/parens.

Bindings accumulate left-to-right (later files/bindings win), matching gin's
behavior for plain value bindings.
"""

from __future__ import annotations

import ast
import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence


@dataclasses.dataclass(frozen=True)
class Ref:
  """A `@configurable` reference appearing as a binding value."""
  name: str

  def __repr__(self):
    return f'@{self.name}'


@dataclasses.dataclass(frozen=True)
class Macro:
  """A `%MACRO` reference appearing as a binding value."""
  name: str

  def __repr__(self):
    return f'%{self.name}'


class ParseError(ValueError):
  pass


def _parse_value(text: str):
  text = text.strip()
  if text.startswith('@'):
    return Ref(text[1:].strip())
  if text.startswith('%'):
    return Macro(text[1:].strip())
  try:
    return ast.literal_eval(text)
  except (ValueError, SyntaxError) as e:
    raise ParseError(f'Cannot parse gin value: {text!r}') from e


def _strip_comment(line: str) -> str:
  """Remove a trailing # comment, respecting string literals."""
  out = []
  in_str: Optional[str] = None
  i = 0
  while i < len(line):
    c = line[i]
    if in_str:
      out.append(c)
      if c == in_str and line[i - 1] != '\\':
        in_str = None
    elif c in ('"', "'"):
      in_str = c
      out.append(c)
    elif c == '#':
      break
    else:
      out.append(c)
    i += 1
  return ''.join(out)


def _bracket_depth_delta(text: str) -> int:
  depth = 0
  in_str: Optional[str] = None
  for i, c in enumerate(text):
    if in_str:
      if c == in_str and text[i - 1] != '\\':
        in_str = None
    elif c in ('"', "'"):
      in_str = c
    elif c in '([{':
      depth += 1
    elif c in ')]}':
      depth -= 1
  return depth


def _logical_lines(text: str) -> List[str]:
  """Join physical lines into logical lines (bracket continuation)."""
  lines = []
  buf = ''
  depth = 0
  for raw in text.splitlines():
    stripped = _strip_comment(raw).strip()
    if not stripped and depth == 0:
      continue
    buf = (buf + ' ' + stripped).strip() if buf else stripped
    depth += _bracket_depth_delta(stripped)
    if depth <= 0 and buf:
      lines.append(buf)
      buf = ''
      depth = 0
  if buf:
    lines.append(buf)
  return lines


class GinConfig:
  """Accumulated bindings: {target: {param: value}} plus macros."""

  def __init__(self):
    self.bindings: Dict[str, Dict[str, Any]] = {}
    self.macros: Dict[str, Any] = {}
    self._search_paths: List[str] = ['']

  def add_search_path(self, path: str):
    if path not in self._search_paths:
      self._search_paths.append(path)

  def _resolve_path(self, path: str) -> str:
    for base in self._search_paths:
      candidate = os.path.join(base, path) if base else path
      if os.path.exists(candidate):
        return candidate
    raise FileNotFoundError(f'gin file not found: {path}')

  def parse_line(self, line: str):
    if line.startswith('include'):
      rest = line[len('include'):].strip()
      target = ast.literal_eval(rest)
      self.parse_file(self._resolve_path(target))
      return
    if line.startswith('import'):
      return  # module imports are meaningless here; targets resolve by name
    if '=' not in line:
      raise ParseError(f'Malformed gin line: {line!r}')
    lhs, rhs = line.split('=', 1)
    lhs = lhs.strip()
    value = _parse_value(rhs)
    if '.' in lhs:
      # Scoped targets like 'train/Config.param' keep their scope prefix.
      target, param = lhs.rsplit('.', 1)
      if not param.isidentifier() or not all(
          p.isidentifier() for p in target.replace('/', '.').split('.')):
        raise ParseError(f'Malformed gin binding target: {lhs!r}')
      self.bindings.setdefault(target, {})[param] = value
    else:
      if not lhs.isidentifier():
        raise ParseError(f'Malformed gin macro name: {lhs!r}')
      self.macros[lhs] = value

  def parse_string(self, text: str):
    for line in _logical_lines(text):
      self.parse_line(line)

  def parse_file(self, path: str):
    with open(self._resolve_path(path)) as f:
      self.parse_string(f.read())

  def resolve(self, value):
    """Substitute macros recursively; Refs are returned as-is."""
    if isinstance(value, Macro):
      return self.resolve(self.macros[value.name])
    if isinstance(value, (list, tuple)):
      return type(value)(self.resolve(v) for v in value)
    if isinstance(value, dict):
      return {k: self.resolve(v) for k, v in value.items()}
    return value

  def get(self, target: str, scope: Optional[str] = None) -> Dict[str, Any]:
    """Merged params for `target`, with `scope/target` overriding `target`."""
    out = dict(self.bindings.get(target, {}))
    if scope:
      out.update(self.bindings.get(f'{scope}/{target}', {}))
    return {k: self.resolve(v) for k, v in out.items()}

  def config_str(self) -> str:
    """Dump the merged config (the reference snapshots this to the exp dir,
    configs.py:186-193)."""
    lines = []
    for name in sorted(self.macros):
      lines.append(f'{name} = {self.macros[name]!r}')
    for target in sorted(self.bindings):
      for param in sorted(self.bindings[target]):
        v = self.bindings[target][param]
        rep = repr(v) if not isinstance(v, (Ref, Macro)) else str(v)
        lines.append(f'{target}.{param} = {rep}')
    return '\n'.join(lines) + '\n'


def parse_config_files_and_bindings(
    config_files: Optional[Sequence[str]],
    bindings: Optional[Sequence[str]] = None,
    search_paths: Optional[Sequence[str]] = None) -> GinConfig:
  """Parse gin files then override with `--gin_bindings`-style strings."""
  cfg = GinConfig()
  for p in search_paths or []:
    cfg.add_search_path(p)
  for f in config_files or []:
    cfg.parse_file(f)
  for b in bindings or []:
    cfg.parse_string(b)
  return cfg
