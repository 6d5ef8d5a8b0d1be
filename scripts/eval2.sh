#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
python -u cli/test_cls.py > runs/test_cls_full.log 2>&1
echo done
