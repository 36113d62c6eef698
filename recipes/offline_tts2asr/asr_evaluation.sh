#!/bin/bash
# Evaluate synthetic speech with a trained ASR model (reference
# recipes/tts/asr_evaluation.sh surface): decode a pseudo idx2wav tree and
# report WER/CER of the synthesized audio.
#
# usage: asr_evaluation.sh --asr_config CFG --asr_exp DIR --syn_path DIR
#                          [--test_model NAME] [--max_len_filter SECONDS]
set -e

asr_config="" asr_exp="" syn_path="" test_model="latest" max_len_filter=""

while [ $# -gt 0 ]; do
    case "$1" in
        --asr_config) asr_config="$2"; shift 2 ;;
        --asr_exp) asr_exp="$2"; shift 2 ;;
        --syn_path) syn_path="$2"; shift 2 ;;
        --test_model) test_model="$2"; shift 2 ;;
        --max_len_filter) max_len_filter="$2"; shift 2 ;;
        *) echo "unknown arg $1"; exit 1 ;;
    esac
done

[ -z "$asr_config" ] || [ -z "$asr_exp" ] || [ -z "$syn_path" ] && {
    echo "usage: asr_evaluation.sh --asr_config CFG --asr_exp DIR --syn_path DIR"
    exit 1
}

# build a derived config whose test set points at the synthetic tree
# (long-utterance filtering via data_selection when requested)
tmp_cfg="$(mktemp --suffix=.yaml)"
python - "$asr_config" "$syn_path" "$tmp_cfg" "$max_len_filter" <<'PYEOF'
import sys
from speechain_tpu.utils.yamlref import load_yaml
import yaml

src, syn, dst, max_len = sys.argv[1:5]
cfg = load_yaml(src)
test = dict(type="abs", conf=dict(
    dataset_type="speech_text",
    dataset_conf=dict(main_data=dict(
        wav=f"{syn}/idx2wav", text=f"{syn}/idx2text")),
    data_len=f"{syn}/idx2wav_len", shuffle=False, batch_size=16))
if max_len:
    sel_len = int(float(max_len) * 16000)
    test["conf"]["dataset_conf"]["data_selection"] = [
        ["min", str(sel_len), f"{syn}/idx2wav_len"]]
cfg["data_cfg"] = {k: v for k, v in cfg["data_cfg"].items()
                   if k in ("train", "valid")}
cfg["data_cfg"]["syn_test"] = test
with open(dst, "w") as f:
    yaml.safe_dump(cfg, f)
PYEOF

python -m speechain_tpu.runner --config "$tmp_cfg" --test \
    --result_path "$asr_exp" --test_model "$test_model"
rm -f "$tmp_cfg"
