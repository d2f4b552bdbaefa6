#!/bin/sh
# Snapshot gate: NEVER commit an end-of-round (or any) snapshot unless
# main AND test sources compile. Round 9 lost 100% of its driver
# evidence to a half-typed method committed at turn limit — this is
# the cheapest insurance in the repo. Run before every commit:
#
#   tools/pre_snapshot.sh && git commit ...
set -e
cd "$(dirname "$0")/.."
sbt -batch Test/compile 2>&1 | tail -3
# sbt -batch returns nonzero on compile failure; set -e propagates it.
echo "[pre_snapshot] compile green — safe to commit"
