#!/usr/bin/env bash
# Download Voxtral Realtime 4B weights (the reference's download_model.sh
# equivalent). ~9 GB total.
set -euo pipefail
DIR="${1:-model}"
BASE="https://huggingface.co/mistralai/Voxtral-Mini-4B-Realtime-2602/resolve/main"
mkdir -p "$DIR"
for f in consolidated.safetensors tekken.json params.json; do
  if [ -f "$DIR/$f" ]; then
    echo "have $f"
  else
    echo "fetching $f ..."
    curl -L --fail -o "$DIR/$f.part" "$BASE/$f"
    mv "$DIR/$f.part" "$DIR/$f"
  fi
done
echo "done: $DIR"
