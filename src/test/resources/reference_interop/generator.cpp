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
uint64_t chainB(const string& s) {
    uint64_t e = 0; for (char c : s) { e <<= 2; e |= nucl_encode(c); }
    return bfc_hash_64(flip(canonical(e, 16), 16), mask_right(16));
}
int main() {
    Bqf_ec f(10, 5, 12, 4, false);   // q=10 c=5 k=12 z=4 -> s=8, hash 16 bits
    // 25 query sequences of length 20; for i%3!=2 insert EVERY smer with a
    // deterministic count, so kmers answer real minima; i%3==2 stay absent
    ofstream counted("/tmp/refbuild/golden_counted.tsv");
    for (int i = 0; i < 25; i++) {
        if (i % 3 == 2) continue;
        string seq = randSeq(i, 20);
        for (int p = 0; p + 8 <= 20; p++) {
            string smer = seq.substr(p, 8);
            int cnt = 1 + ((i * 7 + p) % 29);
            counted << smer << "\t" << cnt << "\n";
            f.insert(chainB(smer), cnt);
        }
    }
    // plus 150 background smers
    for (int i = 100; i < 250; i++) {
        string smer = randSeq(i, 8);
        int cnt = 1 + (i % 30);
        counted << smer << "\t" << cnt << "\n";
        f.insert(chainB(smer), cnt);
    }
    counted.close();
    f.save_on_disk("/tmp/refbuild/golden.bqf");
    ofstream en("/tmp/refbuild/golden_enum.tsv");
    for (auto& kv : f.enumerate()) en << kv.first << "\t" << kv.second << "\n";
    en.close();
    ofstream qs("/tmp/refbuild/golden_queries.tsv");
    int nz = 0;
    for (int i = 0; i < 25; i++) {
        string seq = randSeq(i, 20);
        auto r = f.query(seq);
        if (r.minimum > 0) nz++;
        qs << seq << "\t" << r.minimum << "\t" << r.maximum << "\t" << r.average
           << "\t" << r.kmer_present_ratio << "\n";
    }
    qs.close();
    cout << "elements=" << f.enumerate().size() << " nonzero-min queries=" << nz << endl;
    return 0;
}
