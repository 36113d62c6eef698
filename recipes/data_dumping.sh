#!/bin/bash
# Per-dataset data preparation orchestrator (reference
# datasets/data_dumping.sh:204-335 — 8-step pipeline). Steps map onto the
# pyscripts suite; pass --start_step/--stop_step to run a sub-range.
#
# usage: data_dumping.sh --dataset librispeech --src_path /data/LibriSpeech/train-clean-100 \
#            --save_path data/tc100 [--txt_format no-punc] [--sample_rate 16000] \
#            [--token_type char|subword|word] [--vocab_size 5000] \
#            [--extract_feat] [--extract_pitch] [--start_step 2] [--stop_step 8]
set -e

dataset="" src_path="" save_path="" txt_format="no-punc" sample_rate=""
token_type="char" vocab_size=5000 extract_feat=false extract_pitch=false
start_step=2 stop_step=8

while [ $# -gt 0 ]; do
    case "$1" in
        --dataset) dataset="$2"; shift 2 ;;
        --src_path) src_path="$2"; shift 2 ;;
        --save_path) save_path="$2"; shift 2 ;;
        --txt_format) txt_format="$2"; shift 2 ;;
        --sample_rate) sample_rate="$2"; shift 2 ;;
        --token_type) token_type="$2"; shift 2 ;;
        --vocab_size) vocab_size="$2"; shift 2 ;;
        --extract_feat) extract_feat=true; shift ;;
        --extract_pitch) extract_pitch=true; shift ;;
        --start_step) start_step="$2"; shift 2 ;;
        --stop_step) stop_step="$2"; shift 2 ;;
        *) echo "unknown arg $1"; exit 1 ;;
    esac
done
[ -z "$dataset" ] || [ -z "$src_path" ] || [ -z "$save_path" ] && {
    echo "usage: see header"; exit 1; }

run_step() { [ "$1" -ge "$start_step" ] && [ "$1" -le "$stop_step" ]; }

# step 1 (download) is manual in zero-egress environments.

if run_step 2; then  # meta generation + text normalization
    python -m speechain_tpu.pyscripts.meta_generator --dataset "$dataset" \
        --src_path "$src_path" --save_path "$save_path" \
        --txt_format "$txt_format"
fi

if run_step 3 && [ -n "$sample_rate" ]; then  # downsampling
    python -m speechain_tpu.pyscripts.wave_downsampler \
        --wav_path "$save_path/idx2wav" \
        --save_path "$save_path/wav$sample_rate" \
        --sample_rate "$sample_rate"
    cp "$save_path/wav$sample_rate/idx2wav" "$save_path/idx2wav"
fi

if run_step 4 && $extract_feat; then  # offline feature extraction
    python -m speechain_tpu.pyscripts.feat_extractor \
        --wav_path "$save_path/idx2wav" --save_path "$save_path/feat"
fi

if run_step 5; then  # length files
    python -m speechain_tpu.pyscripts.data_len_generator \
        --data_path "$save_path/idx2wav"
    python -m speechain_tpu.pyscripts.data_len_generator \
        --data_path "$save_path/idx2${txt_format}_text" --is_text
fi

if run_step 6 && $extract_pitch; then  # pitch (FastSpeech2)
    python -m speechain_tpu.pyscripts.pitch_extractor \
        --wav_path "$save_path/idx2wav" --save_path "$save_path/pitch"
fi

# step 7 (speaker embeddings) needs a pretrained encoder checkpoint:
#   python -m speechain_tpu.pyscripts.spk_feat_extractor ...

if run_step 8; then  # vocabulary
    python -m speechain_tpu.pyscripts.vocab_generator \
        --token_type "$token_type" --vocab_size "$vocab_size" \
        --text_path "$save_path/idx2${txt_format}_text" \
        --save_path "$save_path/token/$token_type"
fi

echo "data dumping done: $save_path"
