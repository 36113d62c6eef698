"""Derive the reference decode-throughput baseline (VERDICT r2 item 7).

The reference publishes no decode wall-clock, so we measure its actual
beam-search implementation (/root/reference/speechain/infer_func/
beam_search.py:106-474) on this host with a same-architecture torch
decoder (conformer-small assembly: 6-layer d=256 transformer decoder,
vocab 1000), beam 16, one 8-s utterance per call (sent_per_beam=1, the
reference's recommended evaluation mode — beam_search.py:131-138).

Two measurements:
  full      — decoder forwards on CPU torch (lower bound on ref speed:
              GPU matmuls are faster than CPU's)
  scaffold  — the same loop with a null decode fn returning precomputed
              logits: pure Python/torch loop overhead, which a GPU does
              NOT accelerate
The *generous* baseline assumes the 3090 runs all decoder compute at an
effective 10 TFLOP/s (flattering for these small matmuls):
  ref_time_per_utt >= scaffold_time + decoder_flops / 10e12
This number goes into bench.py as REF_DECODE_UTT_PER_SEC.
"""
import os
import sys
import time

sys.path.insert(0, "/root/reference")
import torch

torch.manual_seed(0)

B_ENC, T_ENC, D, V, BEAM = 1, 201, 256, 1000, 16
N_LAYERS, N_HEADS, FFN = 6, 4, 1024

from speechain.infer_func.beam_search import beam_searching


class TorchDecoder(torch.nn.Module):
    """Same-compute stand-in for the reference's 6-layer transformer
    decoder (full-prefix re-forward each step, as the reference's
    asr_decode_fn does — beam_search.py:299-306 passes the whole
    hypo_text and takes [:, -1, :])."""

    def __init__(self):
        super().__init__()
        self.emb = torch.nn.Embedding(V, D)
        layer = torch.nn.TransformerDecoderLayer(
            d_model=D, nhead=N_HEADS, dim_feedforward=FFN,
            batch_first=True, norm_first=True)
        self.dec = torch.nn.TransformerDecoder(layer, num_layers=N_LAYERS)
        self.out = torch.nn.Linear(D, V)

    def forward(self, enc_feat, enc_feat_mask, text, text_len):
        x = self.emb(text)
        L = text.shape[1]
        causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
        h = self.dec(x, enc_feat, tgt_mask=causal)
        return (self.out(h),)


def run(decode_fn, enc_feat, n=3):
    mask = torch.ones(B_ENC, 1, T_ENC, dtype=torch.bool)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        out = beam_searching(
            enc_feat=enc_feat, enc_feat_mask=mask, asr_decode_fn=decode_fn,
            vocab_size=V, sos_eos=V - 1, padding_idx=0, beam_size=BEAM,
            eos_filtering=True, eos_threshold=-1e9,  # force full maxlen,
            # mirroring bench.py's worst-case decode protocol
        )
        ts.append(time.perf_counter() - t0)
        print(f"  run {i}: {ts[-1]:.2f} s "
              f"(len={int(out['hypo_text_len'].max())})", flush=True)
    return min(ts)


enc = torch.randn(B_ENC, T_ENC, D)

with torch.no_grad():
    dec = TorchDecoder().eval()
    print("full (CPU decoder forwards):", flush=True)
    t_full = run(dec, enc)

    canned = torch.randn(B_ENC * BEAM, 1, V)

    def null_fn(enc_feat, enc_feat_mask, text, text_len):
        return (canned.expand(text.shape[0], text.shape[1], V),)

    print("scaffold (null decode fn):", flush=True)
    t_scaffold = run(null_fn, enc)

# decoder FLOPs for the full search: steps l=1..maxlen, each re-forwards
# B_ENC*BEAM rows over prefix length l. maxlen = T_ENC // 3 (min_f2t_ratio).
maxlen = T_ENC // 3
per_tok_macs = N_LAYERS * (4 * D * D + 2 * D * T_ENC + 2 * D * FFN) + D * V
total_flops = 2 * per_tok_macs * B_ENC * BEAM * sum(
    range(1, maxlen + 1))
gpu_compute_s = total_flops / 10e12
ref_t_generous = t_scaffold + gpu_compute_s
print(f"\nfull={t_full:.2f}s scaffold={t_scaffold:.2f}s "
      f"flops={total_flops/1e9:.1f}G gpu_est={gpu_compute_s*1e3:.1f}ms")
print(f"reference utt/s: measured-CPU {1/t_full:.3f}, "
      f"generous-3090 {1/ref_t_generous:.3f}")
print(f"REF_DECODE_UTT_PER_SEC = {1/ref_t_generous:.2f}")
