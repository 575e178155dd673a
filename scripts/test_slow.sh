#!/usr/bin/env bash
# Runs the slow test tier (87 tests: per-family golden compiles, soaks,
# multi-minute app rigs) CHUNKED — one pytest process per test file, each
# bounded by a timeout — so a full slow-tier pass completes reliably on a
# one-core host (the monolithic run exceeds 25 minutes and holds every
# compiled XLA program in one process's memory; chunking releases both).
#
# Usage:  make test-slow          (or: bash scripts/test_slow.sh)
# Env:    CHUNK_TIMEOUT  per-file bound in seconds (default 1200)
#         SLOW_LOG       append per-chunk results to this file
#
# Matches the reference's test/coverage make targets
# (/root/reference/Makefile:22-29) with the wall-time reality of the
# rebuild's bigger compile-bound tier (CLAUDE.md: one compile per process).
set -u

CHUNK_TIMEOUT="${CHUNK_TIMEOUT:-1200}"
SLOW_LOG="${SLOW_LOG:-}"
cd "$(dirname "$0")/.."

echo "collecting slow-marked files..."
files=$(python -m pytest tests/ -m slow --collect-only -q 2>/dev/null \
        | sed 's/::.*//' | grep '^tests/.*\.py$' | sort -u)
if [ -z "$files" ]; then
    echo "no slow tests collected" >&2
    exit 1
fi

total=0 failed=0 start=$(date +%s)
for f in $files; do
    total=$((total + 1))
    t0=$(date +%s)
    echo "== chunk $total: $f (timeout ${CHUNK_TIMEOUT}s)"
    if timeout "$CHUNK_TIMEOUT" python -m pytest "$f" -m slow -q; then
        status=ok
    else
        status=FAILED
        failed=$((failed + 1))
    fi
    dt=$(( $(date +%s) - t0 ))
    echo "== chunk $total: $f $status in ${dt}s"
    if [ -n "$SLOW_LOG" ]; then
        echo "$(date -u +%FT%TZ) $f $status ${dt}s" >> "$SLOW_LOG"
    fi
done

wall=$(( $(date +%s) - start ))
echo "== slow tier: $((total - failed))/$total files passed in ${wall}s"
[ "$failed" -eq 0 ]
