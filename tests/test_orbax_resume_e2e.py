"""-orbax end-to-end: interrupting critic training and re-invoking
resumes from the saved epoch instead of restarting (the capability the
reference lacks — it restarts from scratch or skips entirely via
cload, SURVEY.md §5)."""

import os

import numpy as np
import pytest

from cgs_tpu.core.config import Config
from cgs_tpu.handler import CRITIC, Handler

pytestmark = pytest.mark.slow  # full train-interrupt-resume cycles


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _cfg(cepochs):
    return Config(train=True, synthetic_data=True, datasize=600,
                  testsize=100, cepochs=cepochs, visevery=20,
                  dropout=0.0, shift=0, orbax=True, cload=False,
                  model="resrun").derive()


def test_critic_resume_from_orbax(workdir, capsys):
    # phase 1: train 2 epochs, orbax saves each epoch
    h1 = Handler(_cfg(cepochs=2))
    h1.load_data()
    h1.critic_pipe()
    ckdir = workdir / "resrun" / "saves" / "orbax-critic"
    assert ckdir.exists() and any(ckdir.iterdir())
    params_after_2 = np.asarray(
        h1.params[CRITIC]["conv0"]["kernel"]).copy()

    # phase 2: ask for 4 epochs — must resume at epoch 2, not restart
    h2 = Handler(_cfg(cepochs=4))
    h2.load_data()
    h2.critic_pipe()
    out = capsys.readouterr().out
    assert "orbax resume: critic epoch 2" in out
    params_after_4 = np.asarray(
        h2.params[CRITIC]["conv0"]["kernel"])
    assert not np.array_equal(params_after_2, params_after_4)

    # phase 3: same epoch budget -> resumes at 4, trains zero epochs,
    # params unchanged
    h3 = Handler(_cfg(cepochs=4))
    h3.load_data()
    h3.critic_pipe()
    assert "orbax resume: critic epoch 4" in capsys.readouterr().out
    np.testing.assert_array_equal(
        params_after_4, np.asarray(h3.params[CRITIC]["conv0"]["kernel"]))
