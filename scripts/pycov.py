"""Clean-room line-coverage tool on ``sys.monitoring`` (PEP 669).

The rig has neither coverage.py nor pytest-cov (and installing packages is
off-limits), so `make coverage` historically fell back to a plain test run
with NO number — round-5 VERDICT #7. This pytest plugin records first-hit
line events for files under ``watsor_tpu/`` (returning DISABLE per
location, so steady-state overhead is ~zero) and reports per-package and
per-file coverage against the executable-line sets derived from each
module's code objects (``co_lines``), the same universe coverage.py uses.

Usage (what `make coverage` runs):
    python -m pytest tests/ -q -p scripts.pycov
Writes COVERAGE.json and prints a per-package table. Line coverage only
(no branch coverage); ``pragma: no cover`` is honored on a line basis.

Multi-process accumulation (the slow tier runs one pytest per file):
set ``PYCOV_DATA=/path/hits.jsonl`` — each process appends its raw
(file, lines-hit) sets there instead of reporting, and
``python scripts/pycov.py merge /path/hits.jsonl`` unions them into the
final report (what `make coverage-all` runs).
"""

import json
import os
import sys
from collections import defaultdict

TOOL_ID = sys.monitoring.COVERAGE_ID
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE_DIR = os.path.join(ROOT, 'watsor_tpu')

_hit = defaultdict(set)      # abspath -> {lineno}


def _on_line(code, lineno):
    filename = code.co_filename
    if filename.startswith(PACKAGE_DIR):
        _hit[filename].add(lineno)
    return sys.monitoring.DISABLE


def start():
    sys.monitoring.use_tool_id(TOOL_ID, 'pycov')
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)


def stop():
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.NO_EVENTS)
    sys.monitoring.free_tool_id(TOOL_ID)


def _executable_lines(path):
    """All executable line numbers of a module: compile it and walk the
    code-object tree collecting co_lines(). Lines marked `pragma: no
    cover` (and anything inside a function/class whose def line is
    marked) are excluded."""
    with open(path, 'rb') as f:
        source = f.read()
    try:
        top = compile(source, path, 'exec')
    except SyntaxError:
        return set()
    no_cover = set()
    for i, text in enumerate(source.decode('utf-8', 'replace')
                             .splitlines(), 1):
        if 'pragma: no cover' in text:
            no_cover.add(i)
    lines = set()
    stack = [top]
    while stack:
        code = stack.pop()
        if code.co_firstlineno in no_cover:
            continue                   # whole def/class excluded
        for const in code.co_consts:
            if hasattr(const, 'co_lines'):
                stack.append(const)
        for _, _, lineno in code.co_lines():
            if lineno is not None and lineno not in no_cover:
                lines.add(lineno)
    return lines


def report(out_path=os.path.join(ROOT, 'COVERAGE.json')):
    per_file = {}
    for dirpath, dirnames, filenames in os.walk(PACKAGE_DIR):
        dirnames[:] = [d for d in dirnames if d != '__pycache__']
        for name in sorted(filenames):
            if not name.endswith('.py'):
                continue
            path = os.path.join(dirpath, name)
            executable = _executable_lines(path)
            if not executable:
                continue
            covered = _hit.get(path, set()) & executable
            rel = os.path.relpath(path, ROOT)
            per_file[rel] = (len(covered), len(executable))

    per_package = defaultdict(lambda: [0, 0])
    for rel, (cov, total) in per_file.items():
        parts = rel.split(os.sep)
        package = os.sep.join(parts[:2]) if len(parts) > 2 else parts[0]
        per_package[package][0] += cov
        per_package[package][1] += total

    grand_cov = sum(c for c, _ in per_file.values())
    grand_total = sum(t for _, t in per_file.values())

    def pct(c, t):
        return round(100.0 * c / t, 1) if t else 0.0

    print('\n---- line coverage (scripts/pycov.py, sys.monitoring) ----')
    for package in sorted(per_package):
        cov, total = per_package[package]
        print('{:36s} {:6.1f}%  ({}/{} lines)'.format(
            package, pct(cov, total), cov, total))
    print('{:36s} {:6.1f}%  ({}/{} lines)'.format(
        'TOTAL', pct(grand_cov, grand_total), grand_cov, grand_total))

    worst = sorted(((pct(c, t), rel, c, t)
                    for rel, (c, t) in per_file.items() if t >= 30),
                   key=lambda r: r[0])[:10]
    print('\nleast-covered files (>=30 executable lines):')
    for p, rel, c, t in worst:
        print('  {:6.1f}%  {} ({}/{})'.format(p, rel, c, t))

    with open(out_path, 'w') as f:
        json.dump({
            'total_pct': pct(grand_cov, grand_total),
            'covered_lines': grand_cov,
            'executable_lines': grand_total,
            'packages': {pkg: {'pct': pct(c, t), 'covered': c, 'total': t}
                         for pkg, (c, t) in sorted(per_package.items())},
            'files': {rel: {'pct': pct(c, t), 'covered': c, 'total': t}
                      for rel, (c, t) in sorted(per_file.items())},
        }, f, indent=1, sort_keys=True)
    print('\nwrote {}'.format(out_path))


def dump(data_path):
    """Append this process's raw hit sets (one JSON object) for a later
    merge — used by the chunked slow tier where each file runs in its
    own pytest process."""
    with open(data_path, 'a') as f:
        f.write(json.dumps({path: sorted(lines)
                            for path, lines in _hit.items()}) + '\n')


def merge(data_path, out_path=os.path.join(ROOT, 'COVERAGE.json')):
    """Union all dumped hit sets into ``_hit`` and produce the report."""
    with open(data_path) as f:
        for line in f:
            if not line.strip():
                continue
            for path, lines in json.loads(line).items():
                _hit[path].update(lines)
    report(out_path)


# ---- pytest plugin hooks (-p scripts.pycov) ----
# monitoring starts at plugin IMPORT (before conftest/test-module imports),
# so module-level lines of everything imported afterwards are counted

_started = False
if os.environ.get('PYCOV', '1') != '0':
    start()
    _started = True


def pytest_unconfigure(config):
    global _started
    if _started:
        stop()
        _started = False
        data_path = os.environ.get('PYCOV_DATA')
        if data_path:
            dump(data_path)
        else:
            report()


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == 'merge':
        merge(sys.argv[2], *sys.argv[3:4])
    else:
        print('usage: python scripts/pycov.py merge <hits.jsonl> '
              '[out.json]', file=sys.stderr)
        sys.exit(2)
