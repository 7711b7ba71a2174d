#!/bin/bash
# Fresh-JVM soak: ONE query per JVM (default) so no query's timing
# inherits another's JVM residue (block-manager leftovers, codegen/JIT
# state, heap fragmentation). Measured twice in r9: one 79-query JVM
# inflated late heavy 10x legs 3-8x over fresh-JVM times despite
# drainBlocks, and even 4-per-JVM chunks leaked — r1's 10x leg read
# 54 s after the k-family index builds in the same JVM vs 6.5 s
# chunk-first. Each JVM pays ~15 s startup plus one untimed warm-up
# leg; that is the price of trustworthy exponents.
# Inflation runs once (first JVM) and is reused via the
# _inflate_<factor>.ok sentinel. Run on an otherwise idle machine.
#
# Usage: run_soak_fresh.sh <outJson> <factor> [chunkSize]
set -e
OUT_JSON="$1"; FACTOR="$2"; CHUNK="${3:-1}"
HERE="$(dirname "$0")"
TMPD=$(mktemp -d /tmp/soak_fresh.XXXX)
mapfile -t QUERIES < <("$HERE/run_soak.sh" /dev/null "$FACTOR" --list)
echo "soaking ${#QUERIES[@]} queries at ${FACTOR}x, $CHUNK per JVM"
: > "$OUT_JSON"
i=0
while [ $i -lt ${#QUERIES[@]} ]; do
  CHUNK_QS=("${QUERIES[@]:$i:$CHUNK}")
  "$HERE/run_soak.sh" "$TMPD/chunk_$i.json" "$FACTOR" "${CHUNK_QS[@]}" \
    > "$TMPD/chunk_$i.log" 2>&1
  cat "$TMPD/chunk_$i.json" >> "$OUT_JSON"
  tail -n "$CHUNK" "$TMPD/chunk_$i.json"
  i=$((i + CHUNK))
done
echo "done -> $OUT_JSON"
