#!/usr/bin/env bash
# COCO download + semi-supervised split generation (reference
# tools/dataset/prepare_coco_data.sh). Run on a machine with egress;
# the sandbox this framework is developed in has none.
set -euo pipefail

help() {
  echo "Usage: $0 [-r ROOT] download|conduct|full"
  echo "  download  fetch COCO train/val/unlabeled2017 + annotations"
  echo "  conduct   generate the 1/5/10% x fold 1-5 semi splits"
  echo "  -r, --root PATH   dataset root (default: data)"
}

data_root=data
here=$(cd "$(dirname "$0")/../.." && pwd)

download() {
  mkdir -p "${data_root}/coco"
  cd "${data_root}/coco"
  for split in train2017 val2017 unlabeled2017; do
    wget "http://images.cocodataset.org/zips/${split}.zip"
    unzip -q "${split}.zip"
  done
  wget http://images.cocodataset.org/annotations/annotations_trainval2017.zip
  unzip -q annotations_trainval2017.zip
  wget http://images.cocodataset.org/annotations/image_info_unlabeled2017.zip
  unzip -q image_info_unlabeled2017.zip
  cd - >/dev/null
}

conduct() {
  python "${here}/tools/dataset/semi_coco.py" \
    --ann "${data_root}/coco/annotations/instances_train2017.json" \
    --out "${data_root}/coco/annotations/semi_supervised"
}

while [[ $# -gt 0 ]]; do
  case $1 in
    -r|--root) data_root=$2; shift 2 ;;
    download) download; exit 0 ;;
    conduct) conduct; exit 0 ;;
    full) download; conduct; exit 0 ;;
    *) help; exit 1 ;;
  esac
done
help
