"""HOCON config loader tests: parse the bundled reference-compatible confs
and check the pyhocon-style accessor API (SURVEY.md §1 L0)."""

import textwrap

from honerf_tpu.config import parse_string


def test_parse_basic_sections():
    conf = parse_string(
        textwrap.dedent(
            """
            general {
                base_exp_dir = ./exp/CASE_NAME/wmask_realobj
                model_type = obj
                data_type = real
                recording = [
                    ./,
                    ./utils
                    ./halo_util
                ]
            }
            train {
                learning_rate =1e-4
                learning_rate_alpha = 0.05
                end_iter = 300000
                batch_size = 441
                refine_pose = True
            }
            model {
                sdf_network {
                    d_out = 257
                    skip_in = [4]
                    v_multires=10
                }
                neus_renderer {
                    n_samples = 64
                    up_sample_steps = 4     # 1 for simple coarse-to-fine
                    perturb = 1.0
                }
            }
            """
        )
    )
    assert conf.get_string("general.model_type") == "obj"
    assert conf["general.base_exp_dir"] == "./exp/CASE_NAME/wmask_realobj"
    assert conf.get_list("general.recording") == ["./", "./utils", "./halo_util"]
    assert conf.get_float("train.learning_rate") == 1e-4
    assert conf.get_int("train.end_iter") == 300000
    assert conf.get_bool("train.refine_pose") is True
    assert conf["model.sdf_network"]["d_out"] == 257
    assert conf["model.sdf_network"]["skip_in"] == [4]
    # Inline comment after a value must be stripped.
    assert conf["model.neus_renderer"]["up_sample_steps"] == 4


def test_parse_quoted_and_colon_styles():
    conf = parse_string(
        """
        general {
          save_dir = "./fit_res/CASE_NAME/wmask"
          fit_type = "12"
          view_num: 8
        }
        dataset {
          image_size = [
            230
            266
          ]
        }
        """
    )
    assert conf.get_string("general.fit_type") == "12"
    assert conf.get_int("general.view_num") == 8
    assert conf.get_list("dataset.image_size") == [230, 266]


def test_case_name_substitution(tmp_path):
    p = tmp_path / "t.conf"
    p.write_text("general { base_exp_dir = ./exp/CASE_NAME/run }\n")
    from honerf_tpu.config import load_config

    conf = load_config(str(p), case="bean")
    assert conf["general.base_exp_dir"] == "./exp/bean/run"


def test_kwarg_splat_into_constructor():
    conf = parse_string(
        "model { net { d_in = 3 \n d_hidden = 256 \n weight_norm = true } }"
    )

    def ctor(d_in, d_hidden, weight_norm):
        return (d_in, d_hidden, weight_norm)

    assert ctor(**conf["model.net"]) == (3, 256, True)
