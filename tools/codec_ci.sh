#!/bin/sh
# CI job for codec-bearing environments (r12 verdict item 6): install the
# optional codec tier and require the codec-marked tests to RUN (zero
# skips). The build container forbids installs, so this runs only in CI /
# dev boxes; everywhere else `pytest -m codec` still passes with the
# PNG round-trip skip-marked and the NotImplementedError guards asserted.
set -e
pip install -r "$(dirname "$0")/../requirements-optional.txt"
# -rs prints skip reasons; the grep enforces the skip count dropped to 0.
# POSIX sh has no pipefail, so a `pytest | tee` pipeline would report
# tee's exit status and let a test FAILURE slip past `set -e` — capture
# pytest's own status explicitly instead.
if ! python -m pytest -m codec -rs -q "$(dirname "$0")/../tests" > /tmp/codec_run.txt 2>&1; then
    cat /tmp/codec_run.txt
    echo "codec tests FAILED" >&2
    exit 1
fi
cat /tmp/codec_run.txt
if grep -q "SKIPPED" /tmp/codec_run.txt; then
    echo "codec tests skipped in a codec-bearing environment" >&2
    exit 1
fi
