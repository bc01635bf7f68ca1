"""GRU captioner entry point (reference main.py)."""

from show_tell_tpu.cli.run import run

if __name__ == "__main__":
    run("gru")
