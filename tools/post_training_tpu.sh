#!/bin/bash
# Round-5 post-training TPU sequence: run AFTER tools/train_flagship.py
# releases the chip.  Each step appends to /tmp/post_tpu.log.
set -x
cd /root/repo
LOG=/tmp/post_tpu.log
LAST=$(python -c "import json;print(json.load(open('runs/flagship_r4/metadata.json'))['last_checkpoint'])")
BEST=$(python -c "import json;print(json.load(open('runs/flagship_r4/metadata.json'))['best_checkpoint'])")
echo "last=$LAST best=$BEST" >> $LOG

# 1. absolute anchor rating of the best checkpoint (plays to outcome)
timeout 3600 python tools/rate_vs_anchor.py \
  --checkpoint runs/flagship_r4/checkpoint/network_${BEST}.msgpack \
  --pairs 24 --sims 200 >> $LOG 2>&1

# 2. 8x128 experiments (each a fresh subprocess; compile cache on)
timeout 2400 python tools/quick_time.py --blocks 8 --filters 128 --batch 1280 --sims 800 --fused >> $LOG 2>&1
timeout 2400 python tools/quick_time.py --blocks 8 --filters 128 --batch 1280 --sims 800 --max-depth 12 >> $LOG 2>&1
timeout 2400 python tools/quick_time.py --blocks 8 --filters 128 --batch 1024 --sims 800 >> $LOG 2>&1
echo DONE >> $LOG
