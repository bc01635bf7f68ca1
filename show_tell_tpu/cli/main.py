"""GRU captioner entry point (reference main.py)."""

from show_tell_tpu.cli.run import run

def run_cli():
    run("gru")


if __name__ == "__main__":
    run_cli()
