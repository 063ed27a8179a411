// CLI: verify <vk.json> <proof.json> -> prints OK/FAIL.
// Parity: src/verify.cpp:29-77.
#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>

extern "C" bool ethsnarks_verify(const char *vk_json, const char *proof_json);

static std::string read_file(const char *path) {
    std::ifstream fh(path);
    if (!fh) {
        std::fprintf(stderr, "cannot open %s\n", path);
        std::exit(2);
    }
    std::stringstream ss;
    ss << fh.rdbuf();
    return ss.str();
}

int main(int argc, char **argv) {
    if (argc < 3) {
        std::fprintf(stderr, "Usage: %s <vk.json> <proof.json>\n", argv[0]);
        return 2;
    }
    std::string vk = read_file(argv[1]);
    std::string proof = read_file(argv[2]);
    if (ethsnarks_verify(vk.c_str(), proof.c_str())) {
        std::printf("OK\n");
        return 0;
    }
    std::printf("FAIL\n");
    return 1;
}
