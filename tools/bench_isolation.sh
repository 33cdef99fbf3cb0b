#!/bin/bash
# In-suite vs isolated bench comparison (VERDICT r8 task 2 done-criterion:
# top-10 in-suite times within 1.3x of single-query isolated runs).
#
# 1. full bench (fork-per-group orchestrator) -> /tmp/bench_insuite.json
# 2. for the N slowest queries, one fresh `SPARK_GRAFT_ONLY` JVM each
# 3. emit a markdown table on stdout (redirect into BENCH_ISOLATION.md)
set -e
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}
N=${1:-10}
cd /root/repo
echo "running full in-suite bench (fork-per-group) at $SF ..." >&2
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS \
  tools/runmain.sh graft.Bench 2>/dev/null | grep '^{' > /tmp/bench_insuite.json
python3 - "$N" <<'EOF' >&2
import json, sys
d = json.load(open('/tmp/bench_insuite.json'))
top = sorted(d['queries'].items(), key=lambda kv: -kv[1])[:int(sys.argv[1])]
open('/tmp/bench_top.txt','w').write(''.join(k + '\n' for k,_ in top))
print('total %.2f s over %d queries; top-%s: %s' % (d['value'], d['n_queries'], sys.argv[1], [k for k,_ in top]))
EOF
: > /tmp/bench_isolated.txt
while read -r q; do
  echo "isolated: $q" >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_ONLY=$q \
    tools/runmain.sh graft.Bench 2>/dev/null | grep '^{' | \
    python3 -c "import json,sys; d=json.load(sys.stdin); print('%s %.2f' % list(d['queries'].items())[0])" \
    >> /tmp/bench_isolated.txt
done < /tmp/bench_top.txt
python3 - <<'EOF'
import json
ins = json.load(open('/tmp/bench_insuite.json'))['queries']
iso = dict((l.split()[0], float(l.split()[1]))
           for l in open('/tmp/bench_isolated.txt') if l.strip())
print('| query | in-suite s | isolated s | ratio |')
print('|---|---|---|---|')
worst = 0.0
for q in sorted(iso, key=lambda q: -ins[q]):
    r = ins[q] / iso[q] if iso[q] > 0 else float('inf')
    worst = max(worst, r)
    print('| %s | %.2f | %.2f | %.2fx |' % (q, ins[q], iso[q], r))
print()
print('worst ratio: %.2fx (criterion: <= 1.3x)' % worst)
EOF
