#!/usr/bin/env python
"""Run every chip benchmark/probe in one session and record PERF.json.

The tunneled TPU can be unavailable for long stretches, so when it IS up
we want one command that collects everything:

  python tools/chip_session.py             # full session (~30-60 min)
  python tools/chip_session.py --only headline,infer

Steps (each in its own subprocess so one failure cannot sink the rest):
  headline   bench.py                      (train patches/sec + vs_baseline)
  infer      bench.py --infer              (grids/sec, batch sweep)
  serve      bench.py --serve              (frozen StableHLO vs live apply)
  suite      bench_suite.py                (all five BASELINE configs)
  ensemble   tools/ensemble_bench.py       (M members vs M solo runs)
  int8       tools/int8_probe.py           (int8 MXU + model-level PTQ)

Writes PERF.json at the repo root: {step: {ok, json, seconds, tail}}.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = {
    'headline': ([sys.executable, 'bench.py'], 2400),
    'infer': ([sys.executable, 'bench.py', '--infer'], 2400),
    'serve': ([sys.executable, 'bench.py', '--serve'], 2400),
    'suite': ([sys.executable, 'bench_suite.py'], 5400),
    'ensemble': ([sys.executable, 'tools/ensemble_bench.py'], 3000),
    'int8': ([sys.executable, 'tools/int8_probe.py'], 3000),
}


def run_step(name, cmd, timeout):
    t0 = time.time()
    try:
        # own process group: a timeout must also kill grandchildren (e.g.
        # bench.py's --cpu-probe subprocess) or they keep saturating the
        # host during the NEXT steps' timings
        proc = subprocess.Popen(cmd, cwd=ROOT, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                start_new_session=True)
        try:
            stdout, stderr = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            import signal
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            raise
        res = subprocess.CompletedProcess(cmd, proc.returncode, stdout,
                                          stderr)
        out = res.stdout.strip().splitlines()
        parsed = None
        for line in reversed(out):
            try:
                parsed = json.loads(line)
                break
            except ValueError:
                continue
        if parsed is None and name == 'suite' and res.returncode == 0:
            # bench_suite.py reports via BENCH_SUITE.json, not stdout;
            # only trust the file when THIS run wrote it (rc 0 + fresh)
            path = os.path.join(ROOT, 'BENCH_SUITE.json')
            try:
                if os.path.getmtime(path) >= t0:
                    with open(path) as fh:
                        parsed = json.load(fh)
            except (OSError, ValueError):
                pass
        return {'ok': res.returncode == 0 and parsed is not None,
                'rc': res.returncode,
                'json': parsed,
                'seconds': round(time.time() - t0, 1),
                'tail': '\n'.join((out + res.stderr.strip().splitlines()
                                   )[-6:])[-2000:]}
    except subprocess.TimeoutExpired:
        return {'ok': False, 'rc': 'timeout',
                'seconds': round(time.time() - t0, 1), 'json': None,
                'tail': f'timed out after {timeout}s'}


def main():
    only = None
    if '--only' in sys.argv:
        i = sys.argv.index('--only')
        if i + 1 >= len(sys.argv) or not sys.argv[i + 1].strip(','):
            raise SystemExit('usage: chip_session.py --only step1[,step2]')
        only = [k for k in sys.argv[i + 1].split(',') if k]
        unknown = set(only) - set(STEPS)
        if unknown:
            raise SystemExit(f'unknown steps {sorted(unknown)}; '
                             f'choose from {sorted(STEPS)}')

    path = os.path.join(ROOT, 'PERF.json')
    results = {}
    if os.path.exists(path) and only:
        with open(path) as fh:   # merge into an existing session record
            results = json.load(fh)
    for name, (cmd, timeout) in STEPS.items():
        if only and name not in only:
            continue
        print(f'=== {name}: {" ".join(cmd)}', flush=True)
        results[name] = run_step(name, cmd, timeout)
        print(json.dumps({name: results[name]['json'],
                          'ok': results[name]['ok'],
                          's': results[name]['seconds']}), flush=True)
        with open(path, 'w') as fh:   # persist after every step
            json.dump(results, fh, indent=2)
    n_ok = sum(r['ok'] for r in results.values())
    print(f'PERF.json: {n_ok}/{len(results)} steps ok')


if __name__ == '__main__':
    main()
