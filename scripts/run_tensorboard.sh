#!/bin/bash
# View training logs (tensorboardX writes into <out-folder>/lightning_logs,
# same location the reference's Lightning logger used).
exec tensorboard --logdir "${1:-mymodel1}/lightning_logs" "${@:2}"
