/* Differential parity oracle: a thin CLI over the REFERENCE engine's game +
 * pattern layers (compiled directly from /root/reference sources with two
 * minml headers stubbed), used to fuzz our host and jit rule/pattern paths
 * against the original implementation (VERDICT round-1 task 5).
 *
 * Line protocol on stdin (one request per line, answers on stdout):
 *   rules <FREESTYLE|STANDARD|RENJU|CARO5|CARO6>
 *   board <rows> <cols> <cells>     cells: rows*cols chars of _XO| row-major
 *   outcome <row> <col> <X|O>       -> getOutcome after that move
 *   forbidden <row> <col>           -> isForbidden for a black stone there
 *   threats                         -> per-cell ThreatType codes, cross then
 *                                      circle, space-separated ints
 *   patterns <X|O>                  -> per-cell 4-direction PatternType codes
 *   defense <row> <col> <X|O> <threat_code>
 *                                   -> per-direction 13-bit defensive masks
 *   quit
 */

#include <alphagomoku/game/Board.hpp>
#include <alphagomoku/game/Move.hpp>
#include <alphagomoku/game/rules.hpp>
#include <alphagomoku/patterns/PatternCalculator.hpp>
#include <alphagomoku/utils/configs.hpp>
#include <alphagomoku/utils/matrix.hpp>
#include <alphagomoku/dataset/data_packs.hpp>
#include <alphagomoku/dataset/SearchDataStorage.hpp>
#include <minml/utils/serialization.hpp>

#include <iostream>
#include <memory>
#include <sstream>
#include <string>

using namespace ag;

static Sign sign_of(const std::string &s)
{
	return (s == "X") ? Sign::CROSS : Sign::CIRCLE;
}

int main()
{
	GameRules rules = GameRules::FREESTYLE;
	matrix<Sign> board;
	std::unique_ptr<PatternCalculator> calc;
	bool calc_dirty = true;

	auto get_calc = [&]() -> PatternCalculator& {
		if (calc == nullptr or calc_dirty)
		{
			GameConfig cfg;
			cfg.rules = rules;
			cfg.rows = board.rows();
			cfg.cols = board.cols();
			cfg.draw_after = board.rows() * board.cols();
			calc = std::make_unique<PatternCalculator>(cfg);
			Sign stm = Sign::CROSS; // side-to-move does not affect patterns
			calc->setBoard(board, stm);
			calc_dirty = false;
		}
		return *calc;
	};

	std::string line;
	while (std::getline(std::cin, line))
	{
		std::istringstream ss(line);
		std::string cmd;
		ss >> cmd;
		if (cmd == "quit")
			break;
		if (cmd == "rules")
		{
			std::string r;
			ss >> r;
			rules = rulesFromString(r);
			calc_dirty = true;
			std::cout << "ok\n" << std::flush;
		}
		else if (cmd == "board")
		{
			int rows, cols;
			std::string cells;
			ss >> rows >> cols >> cells;
			board = matrix<Sign>(rows, cols);
			for (int i = 0; i < rows * cols; i++)
			{
				char ch = cells.at(i);
				Sign s = (ch == 'X') ? Sign::CROSS : (ch == 'O') ? Sign::CIRCLE :
							(ch == '|') ? Sign::ILLEGAL : Sign::NONE;
				board.at(i / cols, i % cols) = s;
			}
			calc_dirty = true;
			std::cout << "ok\n" << std::flush;
		}
		else if (cmd == "outcome")
		{
			int row, col;
			std::string s;
			ss >> row >> col >> s;
			const GameOutcome out = getOutcome(rules, board,
					Move(row, col, sign_of(s)));
			std::cout << static_cast<int>(out) << "\n" << std::flush;
		}
		else if (cmd == "outcome_d")
		{
			// getOutcome with an explicit draw-after-N-moves horizon
			// (reference: rules.cpp getOutcome numberOfMovesForDraw)
			int row, col, draw_after;
			std::string s;
			ss >> row >> col >> s >> draw_after;
			const GameOutcome out = getOutcome(rules, board,
					Move(row, col, sign_of(s)), draw_after);
			std::cout << static_cast<int>(out) << "\n" << std::flush;
		}
		else if (cmd == "forbidden")
		{
			int row, col;
			ss >> row >> col;
			const bool f = isForbidden(board, Move(row, col, Sign::CROSS));
			std::cout << (f ? 1 : 0) << "\n" << std::flush;
		}
		else if (cmd == "threats")
		{
			PatternCalculator &pc = get_calc();
			std::ostringstream out;
			for (int sgn = 0; sgn < 2; sgn++)
			{
				const Sign sign = (sgn == 0) ? Sign::CROSS : Sign::CIRCLE;
				for (int r = 0; r < board.rows(); r++)
					for (int c = 0; c < board.cols(); c++)
						out << static_cast<int>(pc.getThreatAt(sign, r, c)) << ' ';
			}
			std::cout << out.str() << "\n" << std::flush;
		}
		else if (cmd == "patterns")
		{
			std::string s;
			ss >> s;
			const Sign sign = sign_of(s);
			PatternCalculator &pc = get_calc();
			std::ostringstream out;
			for (int r = 0; r < board.rows(); r++)
				for (int c = 0; c < board.cols(); c++)
				{
					const DirectionGroup<PatternType> g = pc.getPatternTypeAt(sign, r, c);
					for (int d = 0; d < 4; d++)
						out << static_cast<int>(g[static_cast<Direction>(d)]) << ' ';
				}
			std::cout << out.str() << "\n" << std::flush;
		}
		else if (cmd == "defense")
		{
			int row, col, threat_code;
			std::string s;
			ss >> row >> col >> s >> threat_code;
			PatternCalculator &pc = get_calc();
			std::ostringstream out;
			for (int d = 0; d < 4; d++)
			{
				const auto m = pc.getDefensiveMoves(
						sign_of(s), row, col, static_cast<Direction>(d));
				out << 'd' << d;
				for (int i = 0; i < m.size(); i++)
					out << ' ' << static_cast<int>(m[i].row) << ','
						<< static_cast<int>(m[i].col);
				out << ' ';
			}
			std::cout << out.str() << "\n" << std::flush;
		}
		else if (cmd == "ho3")
		{
			// the reference stores half-open threes in a SEPARATE bitset
			// (getPatternTypeAt demotes them to NONE, PatternTable.cpp:172)
			std::string s;
			ss >> s;
			const Sign sign = sign_of(s);
			PatternCalculator &pc = get_calc();
			std::ostringstream out;
			for (int r = 0; r < board.rows(); r++)
				for (int c = 0; c < board.cols(); c++)
					for (int d = 0; d < 4; d++)
					{
						// isHalfOpenThree asserts an empty window center
						const bool v = (board.at(r, c) == Sign::NONE)
								and pc.isHalfOpenThreeAt(r, c,
										static_cast<Direction>(d), sign);
						out << (v ? 1 : 0) << ' ';
					}
			std::cout << out.str() << "\n" << std::flush;
		}
		else if (cmd == "classify")
		{
			// raw 20-bit center-free NormalPattern key -> (cross, circle)
			// PatternType codes straight from the reference table
			uint32_t key;
			ss >> key;
			const PatternEncoding enc = PatternTable::get(rules).getPatternType(
					NormalPattern(key));
			std::cout << static_cast<int>(enc.forCross()) << ' '
					<< static_cast<int>(enc.forCircle()) << "\n" << std::flush;
		}
		else if (cmd == "datapack")
		{
			// byte-parity fuzz of the dataset record serialization:
			// deterministically fill a SearchDataPack from an LCG seed
			// (replicated in tools/parity_fuzz.py) and dump the serialized
			// record as hex.  Optional trailing version selects the storage
			// class: 201 (default, SearchDataStorage_v201, .cpp:326-419) or
			// 200 (SearchDataStorage_v2, .cpp:166-280)
			uint64_t seed;
			int rows, cols, version = 201;
			ss >> seed >> rows >> cols >> version;
			uint64_t s64 = seed;
			auto next = [&s64]() {
				s64 = s64 * 6364136223846793005ULL + 1442695040888963407ULL;
				return static_cast<uint32_t>(s64 >> 33);
			};
			SearchDataPack pack(rows, cols);
			for (int i = 0; i < rows * cols; i++)
			{
				const uint32_t r = next();
				if ((r & 7u) == 0)  // ~1/8 cells carry search data
				{
					pack.visit_count[i] = 1 + (next() % 500);
					pack.policy_prior[i] = (next() % 10000) / 10000.0f;
					const float wr = (next() % 1000) / 1000.0f;
					const float dr = (1.0f - wr) * (next() % 1000) / 1000.0f;
					pack.action_values[i] = Value(wr, dr);
					const uint32_t k = next() % 10;
					if (k == 0)
						pack.action_scores[i] = Score::win_in(1 + next() % 30);
					else if (k == 1)
						pack.action_scores[i] = Score::loss_in(1 + next() % 30);
					else
						pack.action_scores[i] = Score(
								static_cast<int>(next() % 2001) - 1000);
				}
			}
			pack.minimax_score = Score(static_cast<int>(next() % 2001) - 1000);
			SerializedObject so;
			if (version == 200)
			{
				SearchDataStorage_v2 storage;
				storage.loadFrom(pack);
				storage.serialize(so);
			}
			else
			{
				SearchDataStorage_v201 storage;
				storage.loadFrom(pack);
				storage.serialize(so);
			}
			std::ostringstream out;
			static const char *hex = "0123456789abcdef";
			for (size_t i = 0; i < so.size(); i++)
			{
				const unsigned char b = so.data()[i];
				out << hex[b >> 4] << hex[b & 15];
			}
			std::cout << out.str() << "\n" << std::flush;
		}
		else
		{
			std::cout << "err unknown command\n" << std::flush;
		}
	}
	return 0;
}
