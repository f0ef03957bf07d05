"""Summarize a jax.profiler trace without TensorBoard.

jax.profiler.start_trace writes both an xplane.pb and a Chrome-trace
`*.trace.json.gz`; this reads the latter (no tensorflow/tensorboard plugin
needed - neither is available on TPU pods) and prints device time grouped
by op category.

Usage:
  python tools/read_trace.py /tmp/trace_out [steps]
(`steps` = how many iterations the traced region contained; durations are
reported per step.)
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def summarize(trace_dir, steps=1, top=25):
  paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                    recursive=True)
  if not paths:
    raise FileNotFoundError(f'no *.trace.json.gz under {trace_dir}')
  with gzip.open(sorted(paths)[-1]) as f:
    data = json.load(f)
  events = data.get('traceEvents', [])

  pid_names = {}
  for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
      pid_names[e['pid']] = e['args'].get('name', '')

  agg = collections.Counter()
  cnt = collections.Counter()
  total = 0.0
  for e in events:
    if e.get('ph') != 'X':
      continue
    if 'TPU' not in pid_names.get(e.get('pid'), ''):
      continue
    name = e.get('name', '?')
    # Skip umbrella step events (whole-program spans + bare step indices).
    if name.startswith('jit_') or name.isdigit():
      continue
    base = re.sub(r'[.\d]+$', '', name)
    agg[base] += e.get('dur', 0)
    cnt[base] += 1
    total += e.get('dur', 0)

  print(f'device time accounted: {total / steps / 1000:.1f} ms/step '
        f'({len(agg)} op categories)')
  for name, us in agg.most_common(top):
    print(f'{us / steps / 1000:9.2f} ms/step {us / total * 100:5.1f}%  '
          f'n={cnt[name]:5d}  {name[:70]}')


if __name__ == '__main__':
  trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/trace_out'
  steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
  summarize(trace_dir, steps)
