#!/bin/bash
# Commit measurement CSVs periodically so VM restarts can't wipe rows
# (this round's restarts reverted every uncommitted row of
# docs/hyperparam_search_r4.csv twice — disk reverts to the committed
# snapshot). Run alongside any long measurement queue:
#   nohup bash .round4_logs/csv_snapshotter.sh > /dev/null 2>&1 &
# Stops by itself when /tmp/snapshotter.stop exists or after 12 h.
cd /root/repo || exit 1
rm -f /tmp/snapshotter.stop
for i in $(seq 1 144); do
  [ -f /tmp/snapshotter.stop ] && exit 0
  if ! git diff --quiet -- docs/hyperparam_search_r4.csv \
        docs/train_layer_bench_r4c.csv 2>/dev/null \
     || [ -n "$(git status --porcelain docs/train_layer_bench_r4c.csv \
                  .round4_logs/dropout_remat.csv 2>/dev/null)" ]; then
    git add docs/hyperparam_search_r4.csv docs/train_layer_bench_r4c.csv \
        .round4_logs/dropout_remat.csv 2>/dev/null
    git commit -q -m "Snapshot measurement CSV progress (restart-safe)" \
        -- docs/hyperparam_search_r4.csv docs/train_layer_bench_r4c.csv \
        .round4_logs/dropout_remat.csv 2>/dev/null
  fi
  sleep 300
done
