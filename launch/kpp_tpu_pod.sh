#!/usr/bin/env bash
# Launch a multi-host MC-KPP TPU run on a Cloud TPU pod slice.
#
# The TPU-native equivalent of the reference's Slurm launcher
# (run/KPPocean.slurm: 1 node x 64 OpenMP threads): one Python process per
# TPU host, jax.distributed.initialize() inferring the pod topology from
# the TPU runtime, the column axis sharded over every chip of every host
# (mckpp_tpu/parallel/distributed.py).
#
# Usage:
#   ./launch/kpp_tpu_pod.sh <tpu-name> <zone> <run-dir-with-namelist-and-data>
#
# The run dir must contain 3D_ocn.nml plus the ancillary/forcing NetCDF
# files it references (the analog of the reference's
# `ln -s $UMDIR/kpp/terramaris_forced/*.nc .` step, README.md:26-40).

set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
RUN_DIR=${3:?run dir}

gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all \
  --command "cd ${RUN_DIR} && python -m mckpp_tpu.cli \
      --namelist 3D_ocn.nml --data-dir . --output-dir output \
      --distributed"
