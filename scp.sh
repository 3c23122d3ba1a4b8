#!/bin/bash
# Push tensorboard logs to a remote host (reference: scp.sh:6)
# Usage: ./scp.sh user@host:/path/to/dest
DEST=${1:?usage: ./scp.sh user@host:/dest}
rsync -avz Experiments/tensorboard_logs/ "$DEST"
