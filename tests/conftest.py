"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def ref_vocab():
    from pears_lite_ray.config import REFERENCE_VOCAB
    from pears_lite_ray.vocab import Vocab

    return Vocab.load(REFERENCE_VOCAB)


@pytest.fixture(scope="session")
def spm_tokenizer(ref_vocab):
    from pears_lite_ray.vocab import SpmTokenizer

    return SpmTokenizer(ref_vocab)


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    """300-doc fixture corpus written once per session (4 parquet files)."""
    from pears_lite_ray.sources.fixtures import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), 300)
    return str(d)
