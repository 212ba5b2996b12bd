#!/usr/bin/env bash
# Training launcher — TPU-idiomatic replacement for the reference's
# train_fixed.sh (SURVEY.md §2.9). No GPU memory probing, cache relocation or
# NCCL env hardening: TPU memory is static and XLA emits collectives from
# shardings, so the launcher reduces to mode selection + preflight + launch.
#
#   ./train.sh [debug|full] [stage1|stage2|toy] [extra args passed through]
set -euo pipefail

MODE="${1:-debug}"; shift || true
STAGE="${1:-stage1}"; shift || true

case "$STAGE" in
  stage1) CONFIG=configs/stage1_3d.yaml; OUT=ckpts/stage1_3d ;;
  stage2) CONFIG=configs/stage2_arkit.yaml; OUT=ckpts/stage2_arkit ;;
  toy)    CONFIG=configs/toy.yaml; OUT=ckpts/toy ;;
  *) echo "unknown stage '$STAGE' (stage1|stage2|toy)"; exit 1 ;;
esac

case "$MODE" in
  # debug: 100-step pipeline smoke (train_fixed.sh:47-50). Runs tiny dims +
  # mock vision so it works with no pretrained weights in the environment;
  # use `full` (or drop the flags) once real checkpoints are available.
  debug) EXTRA="--max_steps 100 --tiny --mock_vision"; OUT="${OUT}_debug" ;;
  full)  EXTRA="" ;;                                          # YAML max_steps (30k)
  *) echo "unknown mode '$MODE' (debug|full)"; exit 1 ;;
esac

echo "🔍 preflight..."
python scripts/preflight.py --config "$CONFIG" --skip-train

echo "🚀 launching: config=$CONFIG out=$OUT mode=$MODE"
python -m vggt_qwen3_tpu.train.sft \
  --config "$CONFIG" \
  --output_dir "$OUT" \
  $EXTRA \
  "$@"

code=$?
if [ $code -ne 0 ]; then
  echo "❌ training exited with code $code"
  echo "   • OOM? reduce batch_size_per_gpu in $CONFIG or add --fsdp N"
  echo "   • data missing? run: python scripts/validate_data.py --config $CONFIG"
  exit $code
fi
echo "✅ done. monitor: python -m vggt_qwen3_tpu.utils.monitor --logdir $OUT"
