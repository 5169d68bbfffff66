#!/bin/bash
# Relay-return runbook (round 3): the moment the TPU relay answers, run the
# full chip sequence unattended and leave the evidence in /tmp:
#
#   1. tools/probe_fused_mlp.py  -> /tmp/probe_mlp.log   (6 MIM step variants,
#      slope-fit; cross-variant first-loss miscompile guard)
#   2. tools/chip_sanity.py check -> /tmp/chip_sanity.log (Mosaic-vs-CPU
#      numerics gate over every training kernel route)
#   3. python bench.py            -> /tmp/bench_relay.log (headline + Dice gate)
#
# Variant selection / BENCH.md updates stay manual (see memory runbook): a
# human (or the next session) reads /tmp/probe_mlp.log, picks the min-slope
# variant that passed the guard, and only then flips models/vit.py defaults.
#
# Probe attempts are cheap to issue but a relay-down init takes ~25 min to
# raise (CLAUDE.md "Environment facts"), so the loop polls with a tiny op and
# backs off 5 min between failures. Never kill this script's children by
# pattern; use the pid files it writes.

cd /root/repo || exit 1
echo "runbook start $(date -u)" >> /tmp/relay_watch.log
# track success in a shell var, NOT by grepping the append-only log — a
# RELAY_OK line from a previous run would otherwise launch the whole chip
# sequence against a dead relay
relay_up=0
for i in $(seq 1 200); do
  if python -c "
import jax, jax.numpy as jnp
jax.devices()
print('RELAY_OK', float(jnp.sum(jnp.ones((8,8)))))
" >> /tmp/relay_watch.log 2>&1; then
    relay_up=1
    break
  fi
  echo "attempt $i failed $(date -u)" >> /tmp/relay_watch.log
  sleep 300
done
if [ "$relay_up" != 1 ]; then
  echo "runbook gave up $(date -u)" >> /tmp/relay_watch.log
  exit 1
fi
echo "relay back $(date -u)" >> /tmp/relay_watch.log

echo "== probe_fused_mlp $(date -u)" > /tmp/probe_mlp.log
python tools/probe_fused_mlp.py >> /tmp/probe_mlp.log 2>&1
echo "EXIT:$?" >> /tmp/probe_mlp.log

echo "== chip_sanity $(date -u)" > /tmp/chip_sanity.log
python tools/chip_sanity.py check >> /tmp/chip_sanity.log 2>&1
echo "EXIT:$?" >> /tmp/chip_sanity.log

# band_chunk A/B at a moderate size (62 bands, ~11 s of compute each):
# measures the per-dispatch relay share the chunked sweep removes
echo "== gigapixel band_chunk A/B $(date -u)" > /tmp/band_chunk.log
python tools/bench_gigapixel.py --size 8192 --preview 0 >> /tmp/band_chunk.log 2>&1
echo "EXIT_A:$?" >> /tmp/band_chunk.log
python tools/bench_gigapixel.py --size 8192 --preview 0 --band_chunk 8 >> /tmp/band_chunk.log 2>&1
echo "EXIT_B:$?" >> /tmp/band_chunk.log

# inference-kernel A/B: does explicit head software-pipelining beat the
# production qkvflat emission order?
echo "== qkvflat pipe A/B $(date -u)" > /tmp/attn_pipe.log
python tools/bench_attn_opt.py qkvflat >> /tmp/attn_pipe.log 2>&1
echo "EXIT_A:$?" >> /tmp/attn_pipe.log
python tools/bench_attn_opt.py qkvflat_pipe >> /tmp/attn_pipe.log 2>&1
echo "EXIT_B:$?" >> /tmp/attn_pipe.log

echo "== bench $(date -u)" > /tmp/bench_relay.log
python bench.py >> /tmp/bench_relay.log 2>&1
echo "EXIT:$?" >> /tmp/bench_relay.log

# int8 inference mode decision probes (ops/quant.py): raw rate first (is
# s8xs8->s32 actually 2x through this backend?), then the headline-graph
# A/B with its Dice gate. One workload per process.
echo "== probe_int8 $(date -u)" > /tmp/probe_int8.log
for w in rawdot mha mosaic; do
  python tools/probe_int8.py "$w" >> /tmp/probe_int8.log 2>&1
  echo "EXIT_$w:$?" >> /tmp/probe_int8.log
done

echo "runbook done $(date -u)" >> /tmp/relay_watch.log
