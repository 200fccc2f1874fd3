"""CLI spill mode (all_in_one low-mem analogue, all_in_one.rs:109-196):
stage-0 state round-trips through disk in the wire format and stage 1
recommits from seeds — the full pipeline must still verify."""
import subprocess
import sys


def test_cli_work_spill(tmp_path):
    key_file = tmp_path / "chain.keys"
    env_cmd = [sys.executable, "-m", "hekaton_tpu.cli"]
    out = subprocess.run(
        env_cmd + ["setup-chain", "--num-subcircuits", "2", "--key-out", str(key_file)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    out = subprocess.run(
        env_cmd + ["work", "--key-file", str(key_file), "--spill-dir", str(tmp_path / "spill")],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "wire format" in out.stdout
    assert "aggregate proof verified" in out.stdout or "verified" in out.stdout, out.stdout[-2000:]
