"""Documentation drift guard: every `dds.<name>` attribute, every
`from dl4ds_tpu... import ...` statement, and every trainer/predict kwarg
referenced in the narrative docs (docs/TUTORIAL.md, README.md) must
resolve against the real package — so the tutorial cannot silently rot as
the API evolves."""

import inspect
import importlib
import os
import re

import pytest

import dl4ds_tpu as dds

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _doc_text(fname):
    with open(os.path.join(_ROOT, fname)) as fh:
        return fh.read()


def _python_blocks(text):
    return re.findall(r'```python\n(.*?)```', text, flags=re.S)


DOCS = ['docs/TUTORIAL.md', 'README.md']


@pytest.mark.parametrize('fname', DOCS)
def test_dds_attributes_resolve(fname):
    text = _doc_text(fname)
    names = set(re.findall(r'\bdds\.(\w+)', text))
    missing = sorted(n for n in names if not hasattr(dds, n))
    assert not missing, f'{fname} references nonexistent dds.{missing}'


@pytest.mark.parametrize('fname', DOCS)
def test_imports_resolve(fname):
    text = _doc_text(fname)
    stmts = re.findall(
        r'^from (dl4ds_tpu[\w.]*) import ([\w, ]+)$',
        '\n'.join(_python_blocks(text)), flags=re.M)
    assert stmts or fname == 'README.md'
    for module, names in stmts:
        mod = importlib.import_module(module)
        for name in (n.strip() for n in names.split(',')):
            assert hasattr(mod, name), f'{fname}: {module}.{name} missing'


def test_tutorial_trainer_kwargs_exist():
    """Every `name=` kwarg in the tutorial's SupervisedTrainer/CGANTrainer/
    predict snippets must be a real parameter (or swallowed **kwargs must
    be architecture params — checked against build_model-reachable names
    is out of scope; trainers with **architecture_params accept any, so
    only check functions with closed signatures)."""
    text = _doc_text('docs/TUTORIAL.md')
    # predict(...) has a closed signature (plus scaler/etc. passthrough?)
    sig = set(inspect.signature(dds.predict).parameters)
    has_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD
        for p in inspect.signature(dds.predict).parameters.values())
    for call in re.findall(r'dds\.predict\(([^)]*)\)', text):
        for kw in re.findall(r'(\w+)=', call):
            if not has_var_kw:
                assert kw in sig, f'predict() has no kwarg {kw!r}'
    # SupervisedTrainer kwargs named in prose backticks like `remat=True`
    sup_sig = set(inspect.signature(dds.SupervisedTrainer).parameters)
    prose_kwargs = set(re.findall(r'`(\w+)=', text))
    # architecture params are forwarded via **architecture_params; restrict
    # the check to kwargs the tutorial attributes to the TRAINER sections
    trainer_kwargs = prose_kwargs & {
        'dtype', 'remat', 'gradient_accumulation_steps', 'early_stopping',
        'patience', 'checkpoints_frequency', 'resume_from_checkpoint',
        'terminate_on_nan', 'steps_per_execution', 'lr_schedule',
        'warmup_steps', 'ema_decay', 'patch_size', 'time_window',
        'season_ids', 'time_metadata', 'mesh', 'data_in_hbm'}
    for kw in trainer_kwargs:
        # dtype/remat are architecture params (forwarded); the rest must
        # be explicit trainer parameters
        if kw in ('dtype', 'remat'):
            continue
        assert kw in sup_sig, f'SupervisedTrainer has no kwarg {kw!r}'


def test_tutorial_names_in_parallel_module():
    from dl4ds_tpu import parallel
    text = _doc_text('docs/TUTORIAL.md')
    for name in re.findall(r'parallel\.(\w+)', text):
        assert hasattr(parallel, name), f'parallel.{name} missing'


def test_tutorial_file_references_exist():
    """Files/paths the docs point the reader at must exist in the repo."""
    text = _doc_text('docs/TUTORIAL.md') + _doc_text('README.md')
    for ref in set(re.findall(
            r'`((?:docs|examples|tools|tests)/[\w./-]+\.(?:md|py|cfg))', text)):
        assert os.path.exists(os.path.join(_ROOT, ref)), f'{ref} missing'


def test_examples_are_self_locating():
    """Every example that imports the package must carry the repo-root
    sys.path shim (they are run from a checkout, not an install)."""
    import glob
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, 'examples', '*.py'))):
        src = open(f).read()
        if 'import dl4ds_tpu' in src:
            assert 'sys.path.insert' in src, \
                f'{os.path.basename(f)} lacks the repo-root sys.path shim'
