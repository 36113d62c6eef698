#!/bin/bash
# Recipe dispatcher (reference recipes/run.sh:285-355 surface): resolves
# {task}/{dataset}/{subset}/exp_cfg/{config}.yaml, runs training then testing.
set -e

task="" dataset="" subset="" config="" train=true test=true resume=false
extra_args=()

usage() {
    echo "usage: run.sh --task {asr|tts|lm|offline_tts2asr} --dataset NAME"
    echo "              [--subset NAME] --config NAME [--skip_train]"
    echo "              [--skip_test] [--resume] [-- extra runner args...]"
    exit 1
}

while [ $# -gt 0 ]; do
    case "$1" in
        --task) task="$2"; shift 2 ;;
        --dataset) dataset="$2"; shift 2 ;;
        --subset) subset="$2"; shift 2 ;;
        --config) config="$2"; shift 2 ;;
        --skip_train) train=false; shift ;;
        --skip_test) test=false; shift ;;
        --resume) resume=true; shift ;;
        --) shift; extra_args=("$@"); break ;;
        *) usage ;;
    esac
done

[ -z "$task" ] || [ -z "$config" ] && usage

root="$(cd "$(dirname "$0")" && pwd)"
if [ -n "$subset" ]; then
    cfg="$root/$task/$dataset/$subset/exp_cfg/$config.yaml"
else
    cfg="$root/$task/$dataset/exp_cfg/$config.yaml"
    [ -f "$cfg" ] || cfg="$root/$task/exp_cfg/$config.yaml"
fi
[ -f "$cfg" ] || { echo "config not found: $cfg"; exit 1; }

resume_flag=""
$resume && resume_flag="--resume"

if $train; then
    python -m speechain_tpu.runner --config "$cfg" --train $resume_flag \
        "${extra_args[@]}"
fi
if $test; then
    python -m speechain_tpu.runner --config "$cfg" --test "${extra_args[@]}"
fi
