"""Logging configuration (ref: makani/utils/logging_utils.py:14-65)."""

import logging
import os
import subprocess

_format = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def config_logger(log_level=logging.INFO):
    # force=True: the environment may have pre-configured the root logger
    # (e.g. backend plugins) at WARNING, which would silence training logs
    logging.basicConfig(format=_format, level=log_level, force=True)
    logging.getLogger().setLevel(log_level)


def log_to_file(logger_name=None, log_level=logging.INFO, log_filename="out.log"):
    os.makedirs(os.path.dirname(os.path.abspath(log_filename)), exist_ok=True)
    log = logging.getLogger(logger_name)
    fh = logging.FileHandler(log_filename)
    fh.setLevel(log_level)
    fh.setFormatter(logging.Formatter(_format))
    log.addHandler(fh)


def log_versions():
    import jax

    logger = logging.getLogger()
    try:
        branch = subprocess.check_output(
            ["git", "rev-parse", "--abbrev-ref", "HEAD"], stderr=subprocess.DEVNULL).strip().decode()
        commit = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL).strip().decode()
        logger.info("--------------- Versions ---------------")
        logger.info("git branch: " + branch)
        logger.info("git hash: " + commit)
    except Exception:
        logger.info("--------------- Versions ---------------")
    logger.info("jax: " + jax.__version__)
    logger.info("----------------------------------------")
