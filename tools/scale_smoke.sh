#!/bin/bash
# Opt-in scale smoke — TWELVE pipelines on generated copies-x tables:
# LSH-CC, PageRank, k-means fit, label propagation, incremental dedup,
# PQ ADC search, Bloom decontamination, FastSS edit-distance join,
# TF-IDF cosine all-pairs, the q200 curation decision table, and the
# q231 eval-overlap contamination report.
# Usage: tools/scale_smoke.sh [sfDir] [copies] [mode] [only] [bits]
# mode: dense (default, densifying worst case) | constant (constant-degree)
# only: optional comma list of sections for a targeted deep soak
set -e
SF=${1:-/root/testdata/sf0.1}
COPIES=${2:-10}
MODE=${3:-dense}
ONLY=${4:-}
BITS=${5:-}
# a bits override with no section filter: default ONLY to the explicit
# "all" spelling so the positional slots don't shift (ADVICE r7 —
# `scale_smoke.sh SF COPIES MODE '' 12` used to abort confusingly)
[ -n "$BITS" ] && ONLY=${ONLY:-all}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Xmx56g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSmoke "$SF" "$COPIES" "$MODE" $ONLY $BITS
