"""LSTM captioner entry point (reference LSTM/main_lstm.py)."""

from show_tell_tpu.cli.run import run

if __name__ == "__main__":
    run("lstm")
