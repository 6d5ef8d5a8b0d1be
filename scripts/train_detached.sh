#!/usr/bin/env bash
cd /root/repo
exec python -u cli/main.py "$@"
