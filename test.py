"""Unittest-style test runner with white/blacklist filtering.

Parity with reference test.py:1-61 (its generic discovery runner): wraps
pytest with -k expressions built from whitelist/blacklist terms.

Usage:
    python test.py                 # run everything
    python test.py -w Normalizer   # only tests matching 'Normalizer'
    python test.py -b torch        # everything except tests matching 'torch'
"""
import argparse
import sys

import pytest


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("-w", "--whitelist", nargs="*", default=[])
    parser.add_argument("-b", "--blacklist", nargs="*", default=[])
    parser.add_argument("extra", nargs="*", default=[])
    args = parser.parse_args(argv)

    terms = []
    if args.whitelist:
        terms.append("(" + " or ".join(args.whitelist) + ")")
    for term in args.blacklist:
        terms.append(f"not {term}")
    pytest_args = ["tests/", "-q"]
    if terms:
        pytest_args += ["-k", " and ".join(terms)]
    pytest_args += args.extra
    return pytest.main(pytest_args)


if __name__ == "__main__":
    sys.exit(main())
