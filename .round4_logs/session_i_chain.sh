#!/bin/bash
# Session-i master chain: post-search measurement queue (compile-cache
# probe -> dropout-remat quick -> dropout-remat full -> tlb_r4c), THEN
# the hyperparameter search to 200 trials. One TPU owner at a time;
# every stage health-gated and resume-safe. Relaunch after any restart:
#   nohup bash .round4_logs/session_i_chain.sh > .round4_logs/chain_nohup.out 2>&1 &
cd /root/repo || exit 1
rm -f /tmp/search_r4.pid   # postq must not wait on a stale search pid
bash .round4_logs/post_search_queue.sh
echo "[chain] postq done, starting search" >> .round4_logs/chain.log
bash .round4_logs/search_r4.sh
echo "[chain] search done" >> .round4_logs/chain.log
