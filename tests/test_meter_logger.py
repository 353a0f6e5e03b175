from antmmf_tpu.common.meter import Meter, SmoothedValue
from antmmf_tpu.common.configuration import Configuration
from antmmf_tpu.utils.logger import Logger, StdoutLogger
from antmmf_tpu.utils.timer import Timer


def test_smoothed_value_window():
    sv = SmoothedValue(window_size=3)
    for v in [1, 2, 3, 4]:
        sv.update(v)
    assert sv.get_latest() == 4
    assert sv.avg == 3.0  # window keeps [2,3,4]
    assert sv.global_avg == 2.5
    assert sv.median == 3.0


def test_meter_update_and_str():
    m = Meter()
    m.update({"train/loss": 1.0, "val/acc": 0.5})
    m.update({"train/loss": 3.0})
    assert m.get_scalar_dict()["train/loss"] == 3.0
    s = str(m)
    assert "train/loss" in s and "val/acc" in s


def test_logger_writes_file(tmp_path):
    cfg = Configuration({"training_parameters": {"save_dir": str(tmp_path)}})
    log = Logger(cfg)
    log.write("hello world")
    log.write("debugmsg", level="debug", donot_print=True)
    assert log.log_file is not None
    content = open(log.log_file).read()
    assert "hello world" in content and "debugmsg" in content


def test_stdout_logger(capsys):
    StdoutLogger().write("msg")
    assert "msg" in capsys.readouterr().out


def test_timer_humanize():
    t = Timer()
    assert "s" in t.get_current()
