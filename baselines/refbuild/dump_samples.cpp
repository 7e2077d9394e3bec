// Dump the node-sample ids the reference's NodeSampler will draw.
//
// NodeSampler::sampleHistEntries takes the first numNodeSamples entries of
// Rand::randomPermutation(N) as its sample set, and that permutation is the
// FIRST RNG use after Rand::setSeed(seed) in an eval_driver run
// (reference: src/evaluationLib/src/metrics/NodeSampler.cpp:9-20).  Printing
// the same prefix here therefore reproduces eval_driver's exact sample ids,
// which our evaluator can pin via --node-samples-file — removing the
// 1000-sample variance from cross-implementation MAP comparisons.
//
// Usage: dump_samples <N> <numSamples> [seed=1]
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "Rand.hpp"

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s N numSamples [seed]\n", argv[0]);
        return 2;
    }
    const int n = std::atoi(argv[1]);
    const int k = std::atoi(argv[2]);
    const int seed = argc > 3 ? std::atoi(argv[3]) : 1;
    Rand::setSeed(seed);
    std::vector<int> perm = Rand::randomPermutation(n);
    for (int i = 0; i < k && i < n; ++i) std::printf("%d\n", perm[i]);
    return 0;
}
