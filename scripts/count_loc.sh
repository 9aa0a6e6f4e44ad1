#!/bin/sh
# Reproducible LoC accounting (ADVICE r4: the VERDICT figure lacked the exact
# command). Buckets match the review's: package (first-party .py + native
# .cpp/.h under the package), scripts/bench/entry, tests.
set -e
cd "$(dirname "$0")/.."

count() { xargs cat 2>/dev/null | wc -l; }

pkg=$(find image_search_engine_for_historical_research_tpu \
    \( -name '*.py' -o -name '*.cpp' -o -name '*.h' \) | sort | count)
scripts=$(find scripts bench.py __graft_entry__.py -name '*.py' -o -name '*.sh' \
    | sort | count)
tests=$(find tests -name '*.py' | sort | count)

echo "package (py+cpp):     $pkg"
echo "scripts+bench+entry:  $scripts"
echo "tests:                $tests"
echo "non-test total:       $((pkg + scripts))"
