"""Summarize a fused-feature A/B log into a ranked table + flip advice.

Parses the `== label` / JSON-line structure tools/ab_fused_features.sh
writes (default /tmp/ab_results.log) and prints each configuration's
rays/s, speedup vs the baseline run in the same log, and which NerfMLP
fuse_* defaults the measurements support flipping (>= 1.00x, i.e. neutral
or better - TODO.md runbook step 3).

  python tools/summarize_ab.py [/tmp/ab_results.log]
"""

import json
import re
import sys


def parse(path):
  runs = []
  label = None
  for line in open(path):
    m = re.match(r'^== (.+)$', line.strip())
    if m:
      label = m.group(1)
      continue
    if line.lstrip().startswith('{'):
      try:
        rec = json.loads(line)
      except json.JSONDecodeError:
        continue
      if 'metric' in rec:
        runs.append((label or rec['metric'], rec))
        label = None
  return runs


def main(path):
  runs = parse(path)
  if not runs:
    print(f'no bench records found in {path}')
    return 1
  base = next((r for l, r in runs if l == 'baseline' and 'value' in r), None)
  print(f'{"config":<16} {"rays/s":>10} {"vs base":>8}')
  best = None
  for label, rec in runs:
    if 'value' not in rec:
      print(f'{label:<16} {"ERROR":>10}   {rec.get("error", "?")}')
      continue
    ratio = rec['value'] / base['value'] if base else float('nan')
    print(f'{label:<16} {rec["value"]:>10.1f} {ratio:>7.3f}x')
    is_train = rec.get('metric') == 'train_rays_per_sec'
    if (is_train and label not in ('baseline', 'all_fwd', 'all_geometry')
        and '+' not in label
        and (best is None or rec['value'] > best[1]['value'])):
      best = (label, rec)
  if base and best:
    ratio = best[1]['value'] / base['value']
    print(f'\nbest feature set: {best[0]} at {best[1]["value"]:.1f} rays/s '
          f'({ratio:.3f}x baseline)')
    if ratio >= 1.0:
      print('=> flip the corresponding NerfMLP.fuse_* defaults '
            '(refnerf_tpu/models/mlp.py), re-run `python bench.py`, update '
            'README/DESIGN tables.')
    else:
      print('=> every feature set lost to baseline; keep defaults off and '
            'record the numbers in DESIGN.md like the round-2 reverts.')
  return 0


if __name__ == '__main__':
  sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/ab_results.log'))
