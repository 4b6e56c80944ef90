#!/usr/bin/env bash
# Driver entry — same CLI surface as the reference's eval_one_file.sh
# (SURVEY.md C1), forwarding to the Python pipeline.
#   ./eval_one_shape.sh --mnk 4096 4096 4096 --acc float32 --mode offline \
#       --base_dir /tmp/eval_out
set -euo pipefail
cd "$(dirname "$0")"
exec python scripts/eval_one_shape.py "$@"
