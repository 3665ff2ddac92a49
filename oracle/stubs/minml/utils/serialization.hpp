/* Stub of minml's SerializedObject for compiling the REFERENCE dataset
 * layer in the parity oracle: a plain growable byte buffer with raw
 * little-endian POD save/load — exactly how the reference dataset code
 * treats it (save<T> of PODs in declaration order, offsets into the blob;
 * see alphagomoku/utils/file_util.hpp serializeVector). */
#ifndef MINML_UTILS_SERIALIZATION_HPP_STUB
#define MINML_UTILS_SERIALIZATION_HPP_STUB

#include <cstdint>
#include <cstring>
#include <vector>

class SerializedObject
{
		std::vector<char> m_data;
	public:
		SerializedObject() = default;
		size_t size() const noexcept
		{
			return m_data.size();
		}
		const char* data() const noexcept
		{
			return m_data.data();
		}
		char* data() noexcept
		{
			return m_data.data();
		}
		void save(const void *src, size_t bytes)
		{
			const char *p = reinterpret_cast<const char*>(src);
			m_data.insert(m_data.end(), p, p + bytes);
		}
		template<typename T>
		void save(const T &value)
		{
			save(&value, sizeof(T));
		}
		void load(void *dst, size_t offset, size_t bytes) const
		{
			std::memcpy(dst, m_data.data() + offset, bytes);
		}
		template<typename T>
		T load(size_t offset) const
		{
			T out;
			std::memcpy(&out, m_data.data() + offset, sizeof(T));
			return out;
		}
};

#endif
