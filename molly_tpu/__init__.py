"""molly_tpu — TPU-native multi-omics multimodal LLM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SeedLLM/molly
(reference: /root/reference): a Qwen3 decoder LLM fused with frozen
ESM-family biological sequence encoders (ESM-2 protein,
nucleotide-transformer DNA/RNA) via linear projectors, plus SFT training,
batched inference, and a multi-task biology benchmark evaluator.

Layering (TPU-first, not a port):
  - ``molly_tpu.data``      tokenizers + parquet dataset + static-shape collation
  - ``molly_tpu.models``    pure-functional Qwen3 / ESM encoders / fusion model
  - ``molly_tpu.ops``       Pallas TPU kernels (flash attention, RMSNorm, fused LCE)
  - ``molly_tpu.parallel``  mesh + GSPMD sharding rules (ZeRO-equivalent)
  - ``molly_tpu.training``  optax-based trainer, LoRA, Orbax checkpointing
  - ``molly_tpu.inference`` KV-cache decode engine + batch inference CLI
  - ``molly_tpu.evalsuite`` the 22-task omics benchmark metric harness
"""

__version__ = "0.1.0"
