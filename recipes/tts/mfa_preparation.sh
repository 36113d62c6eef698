#!/bin/bash
# Montreal Forced Aligner pipeline for FastSpeech2 durations (reference
# datasets/mfa_preparation.sh surface). MFA itself is an external tool (not
# bundled); this script prepares its inputs and converts its outputs.
#
# usage: mfa_preparation.sh --wav_path idx2wav --text_path idx2text \
#            --corpus_dir DIR --aligned_dir DIR --save_path DIR \
#            [--dictionary english_us_arpa] [--acoustic_model english_us_arpa]
set -e

wav_path="" text_path="" corpus_dir="" aligned_dir="" save_path=""
dictionary="english_us_arpa" acoustic_model="english_us_arpa"

while [ $# -gt 0 ]; do
    case "$1" in
        --wav_path) wav_path="$2"; shift 2 ;;
        --text_path) text_path="$2"; shift 2 ;;
        --corpus_dir) corpus_dir="$2"; shift 2 ;;
        --aligned_dir) aligned_dir="$2"; shift 2 ;;
        --save_path) save_path="$2"; shift 2 ;;
        --dictionary) dictionary="$2"; shift 2 ;;
        --acoustic_model) acoustic_model="$2"; shift 2 ;;
        *) echo "unknown arg $1"; exit 1 ;;
    esac
done

[ -z "$wav_path" ] || [ -z "$text_path" ] || [ -z "$save_path" ] && {
    echo "usage: see header"; exit 1; }

# 1. write .lab transcripts next to (copies of) the audio
mkdir -p "$corpus_dir"
python -m speechain_tpu.pyscripts.lab_file_generator \
    --wav_path "$wav_path" --text_path "$text_path" \
    --save_path "$corpus_dir"
# symlink audio into the corpus dir for MFA
python - "$wav_path" "$corpus_dir" <<'PYEOF'
import os, sys
from speechain_tpu.utils.fileio import read_idx2data_file
idx2wav = read_idx2data_file(sys.argv[1])
for idx, path in idx2wav.items():
    dst = os.path.join(sys.argv[2], idx + os.path.splitext(path)[1])
    if not os.path.exists(dst):
        os.symlink(os.path.abspath(path), dst)
PYEOF

# 2. run MFA (must be installed separately; zero-egress images skip this)
if command -v mfa >/dev/null 2>&1; then
    mfa align "$corpus_dir" "$dictionary" "$acoustic_model" "$aligned_dir"
else
    echo "WARNING: 'mfa' not found. Run the alignment elsewhere:"
    echo "  mfa align $corpus_dir $dictionary $acoustic_model $aligned_dir"
    echo "then re-run this script with the aligned TextGrids present."
fi

# 3. TextGrids -> idx2duration + idx2mfa_text
if [ -d "$aligned_dir" ]; then
    python -m speechain_tpu.pyscripts.duration_calculator \
        --textgrid_path "$aligned_dir" --save_path "$save_path"
fi
