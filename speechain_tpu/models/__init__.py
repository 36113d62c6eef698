"""Task-level models: attention ASR, LM, AR-TTS, FastSpeech2 and their
multi-dataloader (semi-supervised) variants.

Rebuild of reference ``speechain/model/*``: each model couples a flax network
(pure, jit-compiled) with a host-side wrapper holding the tokenizer and the
loss/metric assembly (criterion_forward) and inference drivers.
"""
