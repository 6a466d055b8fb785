#!/usr/bin/env bash
# TPU-pod pre-training launcher — the reference's Slurm/torchrun analog
# (/root/reference/scripts/slurm_pretrain.sbatch).
#
# On Cloud TPU pods there is no rendezvous to wire up: every worker runs the
# same command and jax.distributed.initialize() (enabled by --multihost)
# discovers the slice topology from the TPU metadata. Launch on all workers:
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#       --command="cd $REPO_DIR && bash scripts/tpu_pod_pretrain.sh"
#
# Restart-from-checkpoint elasticity (the reference's Hyperpod
# --auto-resume, slurm_pretrain.sbatch:71-75): keep --resume_from_checkpoint
# latest and rerun the same command after any failure; a supervisor loop is
# included below.
#
# The training arg set mirrors slurm_pretrain.sbatch:98-133 (width 2048 x
# depth 24 ablation recipe, WSD schedule, res-256 buckets, 1e6 steps).

set -euo pipefail

OUTPUT_DIR=${OUTPUT_DIR:-gs://your-bucket/f-lite-pretrain}
DATA_PATH=${DATA_PATH:-train-bucket-4}
BASE_IMAGE_DIR=${BASE_IMAGE_DIR:-/mnt/metadata/training}
TEXT_ENCODER=${TEXT_ENCODER:-/mnt/models/Qwen2.5-VL-7B-Instruct}
VAE_DIR=${VAE_DIR:-/mnt/models/flux-vae-tpu}        # converted via tools/convert_checkpoint.py
MAX_RESTARTS=${MAX_RESTARTS:-100}

run_once() {
  python -m f_lite_tpu.train \
    --multihost \
    --model_width 2048 \
    --model_depth 24 \
    --model_head_dim 256 \
    --cross_attn_input_size 3584 \
    --train_data_path "$DATA_PATH" \
    --base_image_dir "$BASE_IMAGE_DIR" \
    --base_url "s3://your-data-bucket" \
    --resolution 256 \
    --use_resolution_buckets \
    --vae_path "$VAE_DIR" \
    --text_encoder_type torch \
    --text_encoder_path "$TEXT_ENCODER" \
    --train_batch_size 16 \
    --learning_rate 1e-4 \
    --lr_scheduler wsd \
    --num_warmup_steps 2000 \
    --max_steps 1000000 \
    --weight_decay 0.01 \
    --max_grad_norm 1.0 \
    --mixed_precision bf16 \
    --gradient_checkpointing \
    --dp 1 --fsdp 0 --tp 1 \
    --checkpointing_steps 500 \
    --checkpoints_total_limit 5 \
    --sample_every 500 \
    --eval_every 500 \
    --output_dir "$OUTPUT_DIR" \
    --report_to tensorboard \
    --resume_from_checkpoint latest
}

attempt=0
until run_once; do
  attempt=$((attempt + 1))
  echo "[launcher] training exited non-zero; restart $attempt/$MAX_RESTARTS"
  if [ "$attempt" -ge "$MAX_RESTARTS" ]; then
    echo "[launcher] giving up after $MAX_RESTARTS restarts"
    exit 1
  fi
  sleep 10
done
