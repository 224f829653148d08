// Export verifier: load a Scala-exported .bqf with the reference's own
// load_from_disk, enumerate, and re-run the 25 golden query sequences.
#include <iostream>
#include <fstream>
#include "bqf_ec.hpp"
#include "additional_methods.hpp"
using namespace std;
string randSeq(int i, int len) {
    const char* bases = "ACGT";
    string s;
    unsigned long long x = 2654435761ULL * (unsigned long long)(i + 1);
    for (int j = 0; j < len; j++) {
        x = x * 6364136223846793005ULL + 1442695040888963407ULL;
        s += bases[(x >> 33) & 3];
    }
    return s;
}
int main(int argc, char** argv) {
    Bqf_ec f = Bqf_ec::load_from_disk(argv[1]);
    cout << "loaded elements=" << f.enumerate().size() << endl;
    ofstream qs(string(argv[1]) + ".queries.tsv");
    for (int i = 0; i < 25; i++) {
        string seq = randSeq(i, 20);
        auto r = f.query(seq);
        qs << seq << "\t" << r.minimum << "\t" << r.maximum << "\t" << r.average
           << "\t" << r.kmer_present_ratio << "\n";
    }
    qs.close();
    return 0;
}
