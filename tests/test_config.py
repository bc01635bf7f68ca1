"""Config system parity tests (reference main.py:31-82)."""

import pytest

from show_tell_tpu.core import load_params, build_arg_parser


def test_defaults_match_reference_config_json():
    p = load_params([], variant="gru")
    assert p["embedding_length"] == 256
    assert p["num_hidden_units"] == 512
    assert p["num_layers"] == 5
    assert p["batch_size"] == 32
    assert p["lr"] == 0.01
    assert p["momentum"] == 0.9
    assert p["vocab_threshold"] == 5
    assert p["num_epochs"] == 100
    assert p["optimizer_type"] == "SGD"
    assert p["resnet_version"] == 101
    assert p["sub_batch_test"] == 10
    assert p["beam_size"] == 0


def test_derived_paths():
    p = load_params([], variant="gru")
    assert p["vocab_path"].endswith("output/COCO/vocab.pkl")
    assert p["ann_path_train"].endswith("COCO/annotations/captions_train2014.json")
    assert p["data_path_test"].endswith("COCO/val2014")


def test_beam_size_forces_batch_one():
    p = load_params(["--beam_size", "3"], variant="gru")
    assert p["batch_size"] == 1


def test_attention_variant_flags():
    p = load_params([], variant="attn")
    assert p["embedding_length"] == 512
    assert p["nos_cnn_filters"] == 2048
    assert p["attn_dim"] == 512
    assert p["alpha_c"] == 1.0
    # beam_size exists as a TPU extension (the reference attention CLI has
    # none); it defaults to 0 (greedy) and does NOT force batch_size=1.
    assert p["beam_size"] == 0


def test_overrides():
    p = load_params(["--lr", "0.001", "--optimizer_type", "Adam", "--num_layers", "2"])
    assert p["lr"] == 0.001
    assert p["optimizer_type"] == "Adam"
    assert p["num_layers"] == 2


def test_all_reference_flags_accepted():
    flags = [
        "--data_dir", "--output_dir", "--train_ann_path", "--test_ann_path",
        "--vocabulary_path", "--train_img_dir", "--test_img_dir",
        "--vocab_threshold", "--embedding_length", "--num_hidden_units",
        "--optimizer_type", "--resnet_version", "--lr", "--momentum",
        "--num_epochs", "--num_layers", "--batch_size", "--shuffle",
        "--num_workers", "--resume_training", "--resume_model_train",
        "--is_training", "--is_testing", "--load_model_test",
        "--device", "--sub_batch_test", "--beam_size",
    ]
    parser = build_arg_parser("gru")
    known = {a for action in parser._actions for a in action.option_strings}
    for f in flags:
        assert f in known, f


def test_extension_beam_keeps_batch_size():
    p = load_params(["--beam_size", "3", "--batch_size", "16"], variant="attn")
    assert p["batch_size"] == 16  # batched beam, no batch-1 forcing
    p = load_params(["--beam_size", "3", "--batch_size", "16"], variant="gru")
    assert p["batch_size"] == 1  # reference main.py:81-82 behavior kept


def test_fast_jpeg_flag():
    assert load_params([], variant="gru")["fast_jpeg"] == 0  # parity default
    assert load_params(["--fast_jpeg", "1"], variant="attn")["fast_jpeg"] == 1


def test_attention_channel_mismatch_errors_early():
    """ResNet-18/34 spatial features are 512-channel; a default
    nos_cnn_filters=2048 attention config must fail with an actionable
    message instead of an opaque dot shape error."""
    import jax
    import pytest

    from show_tell_tpu.models.captioner import CaptionerConfig, init_captioner

    cfg = CaptionerConfig(variant="attn", resnet_version=18, embed_dim=8,
                          hidden_dim=12, vocab_size=20, num_layers=1)
    with pytest.raises(ValueError, match="nos_cnn_filters 512"):
        init_captioner(jax.random.PRNGKey(0), cfg)


def test_data_source_flag_selects_flickr_block():
    p = load_params(["--data_source", "Flickr"], variant="gru")
    assert p["data_source"] == "Flickr"
    assert p["train_ann_path"] == "annotations/captions.tsv"
    assert p["train_img_dir"] == "train"
    # default stays reference-faithful
    assert load_params([], variant="gru")["data_source"] == "MSCOCO"


def test_data_source_equals_form_and_bad_value():
    p = load_params(["--data_source=Flickr"], variant="gru")
    assert p["data_source"] == "Flickr"
    assert p["train_ann_path"] == "annotations/captions.tsv"
    with pytest.raises(SystemExit):  # argparse usage error, not a traceback
        load_params(["--data_source", "NotADataset"], variant="gru")
