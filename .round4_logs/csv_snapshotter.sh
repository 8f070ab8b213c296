#!/bin/bash
# Commit measurement CSVs periodically so VM restarts can't wipe rows
# (this round's restarts reverted every uncommitted row of
# docs/hyperparam_search_r4.csv twice — disk reverts to the committed
# snapshot). Run alongside any long measurement queue:
#   nohup bash .round4_logs/csv_snapshotter.sh > /dev/null 2>&1 &
# Stops by itself when /tmp/snapshotter.stop exists or after 12 h.
cd /root/repo || exit 1
rm -f /tmp/snapshotter.stop

# ADVICE r4: don't commit a torn row captured mid-write. A CSV is "whole"
# when its last line has the same comma count as its header.
csv_whole() {
  [ -f "$1" ] || return 0
  awk -F, 'NR==1{n=NF} END{exit (NF==n) ? 0 : 1}' "$1"
}

for i in $(seq 1 144); do
  [ -f /tmp/snapshotter.stop ] && exit 0
  if ! csv_whole docs/hyperparam_search_r4.csv \
     || ! csv_whole docs/hyperparam_search_r4_top20_e4.csv; then
    sleep 300; continue
  fi
  FILES="docs/hyperparam_search_r4.csv docs/hyperparam_search_r4_top20_e4.csv"
  if [ -n "$(git status --porcelain $FILES 2>/dev/null)" ]; then
    git add $FILES 2>/dev/null
    git commit -q -m "Snapshot measurement CSV progress (restart-safe)" \
        -- $FILES 2>/dev/null
  fi
  sleep 300
done
