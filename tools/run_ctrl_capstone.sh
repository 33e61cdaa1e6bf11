#!/bin/bash
# ControlNet capstone, stage-split (one training per process; CLAUDE.md RSS leak)
set -u
ROOT=/root/repo
LOG=$ROOT/logs/r3_queue
export PYTHONPATH=$ROOT:${PYTHONPATH:-}
echo "[ctrlq] START base $(date +%H:%M:%S)" >> $LOG/queue.log
timeout 7200 python $ROOT/tools/capstone_controlnet.py --base_only > $LOG/ctrl_base.log 2>&1
rc=$?
echo "[ctrlq] base exit $rc $(date +%H:%M:%S)" >> $LOG/queue.log
if [ $rc -ne 0 ]; then exit $rc; fi
echo "[ctrlq] START ctrl $(date +%H:%M:%S)" >> $LOG/queue.log
timeout 7200 python $ROOT/tools/capstone_controlnet.py --skip_base > $LOG/ctrl_ctrl.log 2>&1
rc=$?
echo "[ctrlq] ctrl exit $rc $(date +%H:%M:%S)" >> $LOG/queue.log
exit $rc
