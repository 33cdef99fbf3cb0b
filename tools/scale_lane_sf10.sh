#!/bin/bash
# Two-point growth-curve lane (VERDICT r13 #4, widened r15 per VERDICT
# r14 #3): times ~37 scale-critical keys at sf0.1, at the ScaleGen K=10
# replication (target/sf1) AND at the K=100 replication (target/sf10),
# one fresh JVM per (query, dir). Assembly is DELEGATED to
# tools/sf10_assemble.py (ADVICE r14: this script used to duplicate the
# flag logic inline with the raw r13 rule, so the two writers could
# disagree on flags for the same timings) — the stderr lane log is teed
# to a file and the assembler is the only flag-taxonomy implementation.
# The same log also feeds tools/sf1_from_sf10.py, which emits the
# sf1-lane-format artifact (VERDICT r14 #4) from the identical runs.
#
# QUIET-LANE PROTOCOL (VERDICT r15 #3 — the r15 lesson, written down in
# the log but not enforced: an sf10 row taken while the battery's load
# was still draining read 2x, flagship 104.84 vs 59.53 quiet):
#  - the lane REFUSES TO START while the host's instantaneous busy-CPU
#    fraction exceeds SPARK_GRAFT_LANE_BUSY_MAX (default 0.20) after a
#    bounded wait (SPARK_GRAFT_LANE_START_WAIT, default 600 s) —
#    override deliberately with SPARK_GRAFT_LANE_FORCE=1;
#  - every row waits (bounded, 120 s) for the same threshold and the
#    OBSERVED busy fractions ride the lane line (`busy=a,b,c` — the
#    assembler's anchored regex ignores trailing tokens); a row that
#    never ran quiet is marked ` unclean` on its line and named on a
#    `lane_unclean` line, so a poisoned row incriminates itself in the
#    artifact's own log instead of surfacing next round as an
#    unexplained scale number.
#
# Declared scale rows (VERDICT r14 #2): the artifact-served twins
# ivf_from_index / semdedup_from_index ARE the scale rows; the in-plan
# forms ivf_topk / semdedup_execute are quadratic BY KEY CONSTRUCTION
# (rate-based %83 predicate => cents ∝ N => O(N²·D/83)); they are named
# excluded controls in the assembler's `excluded` map and are NOT run
# here (measured once at r14: 57.08 s / 67.66 s at sf10 vs 2.47 / 3.72
# for the bit-identical twins).
#
# Usage: tools/scale_lane_sf10.sh <round> [outfile]
# Expects target/sf1 and target/sf10 (tools/runmain.sh
# graft.tools.ScaleGen with SPARK_GRAFT_SCALE_K=10 / 100).
set -u
ROUND=${1:?round}
OUT=${2:-BENCH_r${ROUND}_sf10.json}
LOG=${3:-target/sf10_lane_r${ROUND}.log}
MAXBUSY=${SPARK_GRAFT_LANE_BUSY_MAX:-0.20}
cd /root/repo

# r14 set (minus the two demoted in-plan controls) + the text/training
# lanes that had only one-hop evidence (VERDICT r14 #3) + the seven r14
# keys (VERDICT r14 #4) + the round-15 keys (E229-E233) + the round-16
# keys (data_recipe E237, domain_caps E238, script_profile E239).
QUERIES="profile_lineitem profile_lineitem_full dedup_minhash_lsh \
dedup_clusters minhash_dedup_execute jaccard_dedup_execute \
quality_filter_execute substring_dup_execute decontam_execute \
dedup_incremental_lsh dedup_state_compact image_incremental_dedup \
audio_incremental_dedup ivf_from_index semdedup_from_index \
trigram_lm kneser_ney_lm bpe_merges bpe_encode dsir_weights \
corpus_curate pca_power streaming_state_dedup kcenter_coreset \
el2n_select forgetting_events c4_rules c4_filter_execute dup_line_stats \
rholoss_select tracin_scores data_map prototype_prune_from_index \
streaming_interval_join d4_select flesch_readability \
data_recipe domain_caps script_profile \
scd2_history cms_freq semantic_contamination k_anonymize_execute \
bitext_from_index hedge_mix \
domain_quantile_norm text_feature_hash sorted_neighborhood mannwhitney_drift"

# r16 adjudication of the sf10 flagship noise: within ONE quiet-host JVM
# the per-iteration spread on the biggest keys reads up to ±70% (GC/JIT —
# min-of-5 landed 50.53 s vs singles of 65-120 on the SAME idle host, CPU
# control stable ±10%), so min-of-2 under-samples exactly the rows the
# round is judged on. Big keys get extra iterations; the JVM floor is
# per-run, so this only re-times the measured section.
iters_for() {
  case "$1" in
    profile_lineitem|profile_lineitem_full|pca_power) echo 5 ;;
    *) echo 2 ;;
  esac
}

# Instantaneous host busy-CPU fraction over a 1 s window (two /proc/stat
# reads) — the same leading indicator graft.Bench uses for its load gate.
busy_frac() {
  python3 - <<'PY'
import time
def s():
    f = [int(x) for x in open('/proc/stat').readline().split()[1:]]
    return sum(f), f[3] + (f[4] if len(f) > 4 else 0)
t1, i1 = s(); time.sleep(1.0); t2, i2 = s()
print('%.3f' % (1.0 - (i2 - i1) / max(1, (t2 - t1))))
PY
}

wait_quiet() { # $1 = max wait seconds; prints the busy fraction observed
  local deadline=$(( $(date +%s) + ${1:-120} )) b
  b=$(busy_frac)
  while awk -v b="$b" -v m="$MAXBUSY" 'BEGIN{exit !(b > m)}' \
      && [ "$(date +%s)" -lt "$deadline" ]; do
    sleep 3
    b=$(busy_frac)
  done
  echo "$b"
}

is_busy() { awk -v b="$1" -v m="$MAXBUSY" 'BEGIN{exit !(b > m)}'; }

b0=$(wait_quiet "${SPARK_GRAFT_LANE_START_WAIT:-600}")
if is_busy "$b0"; then
  if [ "${SPARK_GRAFT_LANE_FORCE:-0}" != "1" ]; then
    echo "scale_lane_sf10: host busy fraction $b0 > $MAXBUSY after wait —" \
      "refusing to start a scale lane on a contended host" \
      "(SPARK_GRAFT_LANE_FORCE=1 overrides)" >&2
    exit 1
  fi
  echo "scale_lane_sf10: FORCED start on busy host ($b0 > $MAXBUSY)" >&2
fi

run_one() { # dir query [extra env as VAR=VAL ...]
  local dir=$1 q=$2; shift 2
  env "$@" SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ITER="$(iters_for "$q")" \
    SPARK_GRAFT_ONLY="$q" timeout 900 tools/runmain.sh graft.Bench 2>/dev/null \
    | grep -E '^\{' \
    | python3 -c "import json,sys; print(json.load(sys.stdin)['queries'].get('$q','null'))" \
    || echo null
}

lane_row() { # query [extra-env triples applied per dir via globals]
  local q=$1 a b c b01 b1 b10 mark=""
  b01=$(wait_quiet 120); a=$(run_one /root/testdata/sf0.1 "$q")
  b1=$(wait_quiet 120);  b=$(run_one target/sf1 "$q")
  b10=$(wait_quiet 120); c=$(run_one target/sf10 "$q")
  if is_busy "$b01" || is_busy "$b1" || is_busy "$b10"; then
    mark=" unclean"
    echo "lane_unclean $q busy=$b01,$b1,$b10" | tee -a "$LOG" >&2
  fi
  echo "lane $q sf0.1=$a sf1=$b sf10=$c busy=$b01,$b1,$b10$mark" \
    | tee -a "$LOG" >&2
}

# RESUME (r16): a lane is ~90 min of wall and dies with its parent —
# SPARK_GRAFT_LANE_RESUME=1 keeps an existing LOG and skips keys that
# already have a row (clean or self-incriminated-unclean; both carry
# their own evidence), so a killed lane restarts from where it stopped
# instead of re-paying every completed (query, dir) JVM.
if [ "${SPARK_GRAFT_LANE_RESUME:-0}" = "1" ] && [ -s "$LOG" ]; then
  echo "lane_resume busy=$b0 max=$MAXBUSY" | tee -a "$LOG" >&2
else
  : > "$LOG"
  echo "lane_start busy=$b0 max=$MAXBUSY" | tee -a "$LOG" >&2
fi
has_row() { grep -q "^lane $1 " "$LOG"; }
for q in $QUERIES; do
  has_row "$q" || lane_row "$q"
done

# special: kmeans at FIXED k across all three scales (mod tracks the
# corpus so ~24 centroids everywhere — the linear operator regime; the
# declared %83 key is k ∝ N and thus quadratic BY KEY CONSTRUCTION,
# pinned at sf1 already, excluded here to bound lane wall-clock)
if ! grep -q "^lane kmeans " "$LOG"; then
bkm=$(wait_quiet 120)
km01=$(run_one /root/testdata/sf0.1 kmeans_train)
km1=$(run_one target/sf1 kmeans_train SPARK_GRAFT_KMEANS_MOD=830)
km10=$(run_one target/sf10 kmeans_train SPARK_GRAFT_KMEANS_MOD=8300)
echo "lane kmeans fixed-k sf0.1=$km01 sf1=$km1 sf10=$km10 busy=$bkm" \
  | tee -a "$LOG" >&2
fi

python3 tools/sf10_assemble.py "$LOG" "$ROUND" "$OUT"
python3 tools/sf1_from_sf10.py "$LOG" "$ROUND" "BENCH_r${ROUND}_sf1.json"
