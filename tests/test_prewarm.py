"""prewarm CLI surface tests (the device-touching path runs on-chip only;
see engine/prewarm.py — it was driven end-to-end on the real TPU at
48x96x96 and 160x384x384, tools logs in the round notes)."""

import pytest


class TestPrewarmCLI:
    def test_bad_shape_exits(self):
        from oai_analysis_2_tpu.engine.prewarm import main

        with pytest.raises(SystemExit):
            main(["--shape", "48,96"])  # wants D,H,W

    def test_bad_shape_value_errors(self):
        from oai_analysis_2_tpu.engine.prewarm import main

        with pytest.raises(ValueError):
            main(["--shape", "a,b,c"])

    def test_registration_mode_choices(self):
        from oai_analysis_2_tpu.engine.prewarm import main

        with pytest.raises(SystemExit):
            main(["--registration-mode", "bogus"])

    def test_module_dispatch(self, monkeypatch):
        """`python -m oai_analysis_2_tpu prewarm ...` routes to
        engine.prewarm.main with the remaining argv."""
        import oai_analysis_2_tpu.__main__ as cli
        import oai_analysis_2_tpu.engine.prewarm as pw

        seen = {}
        monkeypatch.setattr(pw, "main", lambda argv: seen.setdefault("argv", argv))
        cli.main(["prewarm", "--shape", "8,16,16"])
        assert seen["argv"] == ["--shape", "8,16,16"]
