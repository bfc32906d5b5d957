"""Archery Flight integration scenarios run in-process over real loopback
gRPC (the shape of reference arrow/internal/flight_integration — scenarios
at scenario.go:55-91, driven here like its initServer pattern)."""
import pytest

grpc = pytest.importorskip("grpc")

from arrow_go_tpu.flight import integration as fi  # noqa: E402


@pytest.mark.parametrize("name", sorted(fi.SCENARIOS))
def test_scenario(name):
    fi.run_scenario_inprocess(name)


def test_scenario_list_cli(capsys):
    from arrow_go_tpu import cli
    cli.main(["flight-integration", "list"])
    out = capsys.readouterr().out.split()
    assert "ordered" in out and "session_options" in out
    assert len(out) == len(fi.SCENARIOS)
