#!/bin/sh
# Run a command and report the host CPU-steal share during it.
# Usage: sh tools/steal_watch.sh <cmd...>
# Prints "[steal] X.X% of elapsed cpu-time stolen" on stderr at exit.
# The sandbox VM is CPU-oversubscribed in bursts (cumulative steal in
# /proc/stat exceeds user time); a measurement taken while steal > ~5%
# is weather, not capability — rerun it.
before=$(awk '/^cpu /{print $2+$3+$4+$5+$6+$7+$8, $9}' /proc/stat)
"$@"
rc=$?
after=$(awk '/^cpu /{print $2+$3+$4+$5+$6+$7+$8, $9}' /proc/stat)
b_tot=$(echo "$before" | cut -d' ' -f1); b_st=$(echo "$before" | cut -d' ' -f2)
a_tot=$(echo "$after"  | cut -d' ' -f1); a_st=$(echo "$after"  | cut -d' ' -f2)
d_tot=$((a_tot - b_tot + a_st - b_st)); d_st=$((a_st - b_st))
if [ "$d_tot" -gt 0 ]; then
  pct=$(awk "BEGIN{printf \"%.1f\", 100.0*$d_st/$d_tot}")
  echo "[steal] ${pct}% of elapsed cpu-time stolen (d_steal=$d_st jiffies)" >&2
fi
exit $rc
