#!/bin/bash
# Five-second host-health probe: decides "is a vs-anchor bench ratio
# measuring the code or the box?" WITHOUT running any Spark workload.
#
# BASELINE.md's box-state rule keys off solo floors of untouched
# queries (>1.2x in unison => box). That verdict costs a Spark run
# and is confounded by JIT/page-cache warmth. The three numbers here
# are workload-independent and name the mechanism directly:
#
#   ctx_switch_us   pipe ping-pong wakeup latency. Spark's scheduler,
#                   RPC, and block-manager paths are context-switch
#                   dense, so sub-second (dispatch-dominated) bench
#                   queries track this almost linearly. Healthy: 2-6.
#                   2026-08-16 degraded night: 28-62 — the same night
#                   solo floors of untouched sub-second queries read
#                   1.6-3.0x and a load-0.26 full sweep read
#                   ratio_sum_large 1.466.
#   steal_pct       hypervisor steal while THIS probe idles. Healthy:
#                   ~0. Degraded night: 1.3-3.0 at idle.
#   disk_mb_s       1 GiB fdatasync write. Healthy band on this box:
#                   >1000 (3.7 GB/s observed quiet); degraded bursts:
#                   60-380.
#   sha_mb_s        single-core SHA-256 — pins "CPU itself is fine"
#                   (it stayed ~1300 through the degraded night, which
#                   is what separates hypervisor-wakeup degradation
#                   from plain CPU contention).
#
# Reading: ctx_switch_us > 10 or steal_pct > 1 => vs-anchor ratios are
# a box reading; gate on per-family solo floors and the sentinel tiers'
# 2x-of-quiet-receipt ceilings instead, and re-run the sweep when this
# probe reads healthy. See BASELINE.md "headline-instrument policy".
set -euo pipefail
# all 8 tick fields (user nice system idle iowait irq softirq steal) so
# the denominator matches HostProbe.scala's — dropping irq/softirq would
# overstate steal exactly on interrupt-heavy degraded boxes
read -r _ u1 n1 s1 i1 w1 q1 sq1 st1 _ < <(grep -m1 '^cpu ' /proc/stat)
CTX=$(python3 - <<'EOF'
import os, time
r1, w1 = os.pipe(); r2, w2 = os.pipe()
pid = os.fork()
if pid == 0:
    for _ in range(20000):
        os.read(r1, 1); os.write(w2, b'x')
    os._exit(0)
t = time.time()
for _ in range(20000):
    os.write(w1, b'x'); os.read(r2, 1)
print(round((time.time() - t) / 40000 * 1e6, 1))
os.waitpid(pid, 0)
EOF
)
SHA=$(python3 - <<'EOF'
import hashlib, time
x = b'a' * 1000000
t = time.time()
for _ in range(1000):
    hashlib.sha256(x).digest()
print(round(1000 / (time.time() - t)))
EOF
)
# dd prints SI units (GB=1000MB, kB=1/1000MB) — handle every suffix so a
# severe stall printing "850 kB/s" can't read as a healthy 850 MB/s
DISK=$(dd if=/dev/zero of=/tmp/.box_probe_dd bs=1M count=1024 conv=fdatasync 2>&1 |
  awk '/copied/ { v = $(NF-1)
    if ($NF ~ /^GB/) v *= 1000
    else if ($NF ~ /^kB/) v /= 1000
    else if ($NF ~ /^B\//) v /= 1000000
    print int(v) }')
rm -f /tmp/.box_probe_dd
read -r _ u2 n2 s2 i2 w2 q2 sq2 st2 _ < <(grep -m1 '^cpu ' /proc/stat)
STEAL=$(python3 -c "
d = [$u2-$u1, $n2-$n1, $s2-$s1, $i2-$i1, $w2-$w1, $q2-$q1, $sq2-$sq1, $st2-$st1]
print(round(100.0 * d[7] / max(1, sum(d)), 2))")
echo "{\"box_probe\":1,\"ctx_switch_us\":$CTX,\"steal_pct\":$STEAL,\"disk_mb_s\":$DISK,\"sha_mb_s\":$SHA,\"load1\":\"$(awk '{print $1}' /proc/loadavg)\"}"
