"""Soft-attention GRU entry point (reference Attention/main_attn.py)."""

from show_tell_tpu.cli.run import run

if __name__ == "__main__":
    run("attn")
