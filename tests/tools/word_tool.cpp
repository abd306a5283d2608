// Differential-test oracle for the reference's word utilities:
// utils::contains_word (html.cpp:1030-1038, first-occurrence quirk)
// and utils::replace_any_copy (html.cpp:1050-1062, space collapse).
// Compiles against the READ-ONLY reference; harness only, no
// reference code is copied into the engine.
//
// Protocol per case: "<len_h> <len_w>\n" + h bytes + "\n" + w bytes +
// "\n"; answer: "<0|1> <len_r>\n" + replace_any_copy(h," \f\n\r\t\v",' ')
// + "\n".
// html.cpp is included (not linked): utils::contains_word /
// replace_any_copy are defined `inline` there, invisible across
// translation units.
#include "html.cpp"
#include <iostream>
#include <string>

int main() {
    std::ios::sync_with_stdio(false);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t sp = line.find(' ');
        size_t lh = std::stoul(line.substr(0, sp));
        size_t lw = std::stoul(line.substr(sp + 1));
        std::string h(lh, '\0'), w(lw, '\0');
        std::cin.read(&h[0], lh);
        std::cin.ignore(1);
        std::cin.read(&w[0], lw);
        std::cin.ignore(1);
        bool m = html::utils::contains_word(h, w);
        std::string r = html::utils::replace_any_copy(h, " \f\n\r\t\v", " ");
        std::cout << (m ? 1 : 0) << " " << r.size() << "\n" << r << "\n";
        std::cout.flush();
    }
    return 0;
}
